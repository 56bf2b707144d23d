from ihmr_tpu.utils import io_utils, vis, visualizer  # noqa: F401
