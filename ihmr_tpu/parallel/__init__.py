from ihmr_tpu.parallel import dist  # noqa: F401
from ihmr_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    batch_sharding,
    gather_to_host,
    make_mesh,
    pad_to_multiple,
    replicate,
    replicated,
    shard_batch,
)
