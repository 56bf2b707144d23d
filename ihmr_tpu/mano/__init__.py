from ihmr_tpu.mano.model import ManoModel, FINGERTIP_VERTEX_IDS, MANO_PARENTS  # noqa: F401
from ihmr_tpu.mano.loader import load_mano_model, synthetic_mano_model  # noqa: F401
from ihmr_tpu.mano.layer import (  # noqa: F401
    mano_decode,
    two_hand_decode_mirrored,
    two_hand_decode,
    two_hand_decode_from_identity,
    two_hand_decode_from_shape_affine,
    two_hand_identity_orient_payload,
    two_hand_shape_affine_payload,
    HandParams,
)
