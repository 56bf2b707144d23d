"""MANO model container (a JAX pytree of blend-shape / skinning tensors).

Semantics follow the standard MANO/SMPL formulation consumed by the reference
through the external ``smplx`` package (ref: src/models/baseline_model.py:133-153
loads ``MANO_{LEFT,RIGHT}.pkl`` via ``smplx.create(..., 'mano', use_pca=False)``):

    v_shaped = v_template + shapedirs . betas
    J        = J_regressor @ v_shaped
    v_posed  = v_shaped + posedirs . vec(R(theta_hand) - I)
    verts    = LBS(v_posed, lbs_weights, global transforms of (orient, theta))

Constants:
  * ``FINGERTIP_VERTEX_IDS`` — the five fingertip vertices appended to the 16
    MANO joints to form 21 joints/hand (ref: baseline_model.py:135,231-232),
    order [thumb, index, middle, ring, pinky].
  * ``MANO_PARENTS`` — the 16-joint kinematic tree of MANO
    (wrist; index 1-3; middle 4-6; pinky 7-9; ring 10-12; thumb 13-15).
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np

NUM_VERTS = 778
NUM_JOINTS = 16  # MANO skeleton joints (before fingertip augmentation)
NUM_FACES = 1538
NUM_BETAS = 10
NUM_POSE_JOINTS = 15  # articulated joints (excl. root)

FINGERTIP_VERTEX_IDS = (744, 320, 443, 554, 671)

MANO_PARENTS = np.array([-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14], np.int32)


@flax.struct.dataclass
class ManoModel:
    """Pytree of MANO tensors for one hand.

    Shapes: v_template (778, 3); shapedirs (778, 3, 10); posedirs (135, 2334);
    j_regressor (16, 778); lbs_weights (778, 16); faces (1538, 3) int32.
    ``faces`` is a pytree LEAF (not static metadata): arrays in jit-static
    metadata break the compilation-cache equality check, and traced gather
    indices compile identically.
    """

    v_template: jnp.ndarray
    shapedirs: jnp.ndarray
    posedirs: jnp.ndarray
    j_regressor: jnp.ndarray
    lbs_weights: jnp.ndarray
    faces: jnp.ndarray
    is_rhand: bool = flax.struct.field(pytree_node=False, default=True)

    def astype(self, dtype) -> "ManoModel":
        return ManoModel(
            v_template=self.v_template.astype(dtype),
            shapedirs=self.shapedirs.astype(dtype),
            posedirs=self.posedirs.astype(dtype),
            j_regressor=self.j_regressor.astype(dtype),
            lbs_weights=self.lbs_weights.astype(dtype),
            faces=self.faces,
            is_rhand=self.is_rhand,
        )
