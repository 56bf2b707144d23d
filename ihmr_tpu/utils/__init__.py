from ihmr_tpu.utils import io_utils, train_visuals, vis, visualizer  # noqa: F401
