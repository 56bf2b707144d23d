"""ihmr_tpu — a TPU-native (JAX/XLA/Pallas) framework for monocular 3D
reconstruction of two interacting MANO hands with collision-aware factorized
refinement.

Re-implements, TPU-first, the full capability surface of the PyTorch/CUDA
reference (penincillin/IHMR):

  * IHMR-Baseline — ResNet-50 encoder + iterative-residual regressor
    (ref: src/models/baseline_model.py, src/models/networks.py)
  * IHMR-MLP     — per-parameter-group MLP refinement cascade
    (ref: src/models/mlp_model.py, src/strategies/mlp_default.py)
  * IHMR-OPT     — per-sample collision-aware test-time optimization
    (ref: src/models/optimize_model.py, src/strategies/opt_default.py)

Design: the compute path is pure-functional JAX (vmap + lax.scan + pjit over a
data mesh); the SDF-style collision loss is an MXU-friendly exact
point-to-mesh penetration op instead of a CUDA voxel grid; refinement loops
are single jitted scans instead of Python optimizer loops.
"""

__version__ = "0.1.0"

from ihmr_tpu import core, mano, ops, losses, refine, models, parallel, data, eval, train, utils  # noqa: F401
