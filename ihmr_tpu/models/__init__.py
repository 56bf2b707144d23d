from ihmr_tpu.models.encoder import (  # noqa: F401
    InterHandEncoder,
    SubNetwork,
    TOTAL_PARAMS_DIM,
    build_mean_params,
)
from ihmr_tpu.models.resnet import ARCHS, ResNet, get_backbone  # noqa: F401
