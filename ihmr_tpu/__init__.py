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

import os as _os

# The axon TPU PJRT plugin in this image ignores JAX_PLATFORMS /
# JAX_PLATFORM_NAME and dials its tunnel during backend init regardless;
# with the tunnel unreachable, a "CPU-forced" process (CLI smoke tests,
# subprocess tools) hangs in the plugin's connect-retry loop instead of
# running on CPU. Honor an explicit CPU request by mirroring it into the
# config knob the plugin does respect, before any backend query. Only the
# cpu case is mirrored: the ambient image env carries JAX_PLATFORMS=axon,
# and force-pinning that would drop the cpu backend (breaking
# jax.devices("cpu") host-staging paths) and the auto-selection fallback.
_plat = _os.environ.get("JAX_PLATFORMS") or _os.environ.get("JAX_PLATFORM_NAME")
if _plat and _plat.strip().lower() == "cpu":
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
    except Exception:  # jax absent/already initialized: never block import
        pass
del _os, _plat

from ihmr_tpu import core, mano, ops, losses, refine, models, parallel, data, eval, train, utils  # noqa: F401
