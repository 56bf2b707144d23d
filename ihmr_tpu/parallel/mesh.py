"""Device mesh + data-parallel sharding helpers.

The reference's one parallelism strategy is DP: one process per GPU, DDP
gradient allreduce over NCCL, filesystem pickle gathers for results
(ref src/utils/init_utils.py:10-18; SURVEY.md §2.7/§5.8). TPU-native
equivalent: a 1-D ``jax.sharding.Mesh`` over all chips; batches are sharded
on the 'data' axis, parameters replicated, and ``jit`` inserts the gradient
psum over ICI automatically when the loss averages over the global batch.
IHMR-OPT needs zero cross-chip communication (per-sample independent), so
sharding its batch gives linear scaling by construction.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree: Any, mesh: Mesh, axis: str = DATA_AXIS) -> Any:
    """device_put every leaf with its leading dim sharded on the mesh."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(n: int, m: int) -> int:
    """Samples to add so n is divisible by m (the reference pads eval datasets
    to batch*world_size by replicating the first sample; ref
    baseline_dataset.py:57-64)."""
    return (m - n % m) % m


def gather_to_host(tree: Any) -> Any:
    """Pull (possibly sharded) arrays to host numpy. In multi-process
    deployments use jax.experimental.multihost_utils.process_allgather on the
    per-process shards instead of the reference's pickle-file gather."""
    if jax.process_count() > 1:  # pragma: no cover - single-host CI
        from jax.experimental import multihost_utils

        return jax.tree_util.tree_map(multihost_utils.process_allgather, tree)
    return jax.tree_util.tree_map(np.asarray, tree)
