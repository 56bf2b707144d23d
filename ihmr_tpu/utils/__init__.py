from ihmr_tpu.utils import io_utils  # noqa: F401
