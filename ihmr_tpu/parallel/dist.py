"""Multi-process (multi-host) initialization + result gather.

Replaces ref src/utils/init_utils.py (torch.distributed NCCL init) with
``jax.distributed``: one process per host, all chips of a host owned by that
process, collectives over ICI/DCN handled by XLA. The reference's
file-pickle result gather (ref test_baseline.py:67-78, optimize.py:78-89)
maps to either ``gather_evaluators`` (same filesystem mechanism — works on
any shared FS) or ``parallel.gather_to_host`` (ICI allgather).
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Optional

import jax

from ihmr_tpu.utils import io_utils


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> tuple[int, int]:
    """Initialize multi-process JAX; returns (rank, world_size).

    No-op single-process when no coordinator configuration is present
    (mirrors the reference's non-dist mode, rank == -1 semantics handled by
    callers via rank <= 0 checks)."""
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=process_id if process_id is not None else int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
    return jax.process_index(), jax.process_count()


def barrier(name: str = "barrier"):
    """Cross-process sync point (ref dist.barrier())."""
    if jax.process_count() > 1:  # pragma: no cover - single-host CI
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def sync_mlp_caches(caches, save_dir: str, rank: int, world_size: int):
    """Cross-rank MLP prediction-cache sync (ref mlp_model.py:676-681):
    each rank writes its cache, barrier, then folds every rank's indices in.
    Single-process: no-op."""
    if world_size <= 1:
        return caches
    path = osp.join(save_dir, f"process_{max(rank, 0)}.pkl")
    io_utils.save_pkl(path, caches)
    barrier("sync_mlp_caches")
    for r in range(world_size):
        if r == max(rank, 0):
            continue
        other = io_utils.load_pkl(osp.join(save_dir, f"process_{r}.pkl"))
        caches.merge(other)
    return caches


def gather_evaluators(evaluator, save_dir: str, tag: str, rank: int, world_size: int):
    """Filesystem gather of per-rank Evaluators; rank 0 returns the merged
    evaluator, others return None (the reference's mechanism)."""
    path = osp.join(save_dir, f".{tag}_{max(rank, 0)}.pkl")
    io_utils.save_pkl(path, evaluator)
    barrier("gather_evaluators")
    if rank > 0:
        return None
    evaluator.clear()
    for r in range(world_size):
        p = osp.join(save_dir, f".{tag}_{r}.pkl")
        other = io_utils.load_pkl(p)
        evaluator.gather_pred(other.pred_results)
        os.remove(p)
    return evaluator
