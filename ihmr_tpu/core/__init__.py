from ihmr_tpu.core import rotations, projection, procrustes  # noqa: F401
