"""Real two-process jax.distributed test of parallel/dist.py.

Round 1 left the multi-rank branches of barrier/gather_evaluators/
sync_mlp_caches unexecuted (single-process CI). Here two actual processes
rendezvous through a CPU-backend coordinator (the same jax.distributed
mechanism a multi-host TPU pod uses) and exercise the filesystem gather the
reference performs with pickle files + dist.barrier()
(ref src/test_baseline.py:67-78, src/models/mlp_model.py:661-681).
"""

import os
import os.path as osp
import socket
import subprocess
import sys

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

_WORKER = r"""
import sys

sys.path.insert(0, sys.argv[4])
rank, port, workdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]

import numpy as np

from ihmr_tpu.parallel import dist

r, w = dist.initialize(f"127.0.0.1:{port}", num_processes=2, process_id=rank)
assert (r, w) == (rank, 2), (r, w)
dist.barrier("start")

# ---- Evaluator gather: each rank contributes 3 results, rank 0 merges all 6
from ihmr_tpu.eval.evaluator import Evaluator

ev = Evaluator(data_list=[])
ev.gather_pred(
    [{"img_path_relative": f"rank{rank}_{i}", "payload": rank * 100 + i} for i in range(3)]
)
merged = dist.gather_evaluators(ev, workdir, "gather_test", rank, w)
if rank == 0:
    got = sorted(p["img_path_relative"] for p in merged.pred_results)
    want = sorted(f"rank{r}_{i}" for r in range(2) for i in range(3))
    assert got == want, got
    payloads = {p["img_path_relative"]: p["payload"] for p in merged.pred_results}
    assert payloads["rank1_2"] == 102
    print("GATHER_OK")
else:
    assert merged is None

# ---- MLP cache sync: rank-strided fills must union into a full cache
from ihmr_tpu.refine.mlp_engine import _TRACKED, MLPCaches
from ihmr_tpu.refine.schedule import PARAM_GROUP_DIMS

import pytest

pytestmark = pytest.mark.slow  # multi-process / full-schedule tests (fast tier: -m "not slow")

N = 8
caches = MLPCaches(num_data=N)
idx = np.arange(rank, N, 2)
feat = np.tile(idx[:, None].astype(np.float32), (1, 1024))
params = {
    name: np.tile((idx[:, None] * 10 + d).astype(np.float32), (1, d))
    for d, name in ((PARAM_GROUP_DIMS[n], n) for n in PARAM_GROUP_DIMS)
}
losses = {k: idx.astype(np.float32) + j for j, k in enumerate(_TRACKED)}
caches.save(idx, feat, params, losses)
caches = dist.sync_mlp_caches(caches, workdir, rank, w)
assert caches.exists.all(), caches.exists
# entries written by the OTHER rank must round-trip exactly
other = np.arange(1 - rank, N, 2)
assert (caches.img_feat[other, 0] == other).all()
for name, d in PARAM_GROUP_DIMS.items():
    assert (caches.prev_params[name][other, 0] == other * 10 + d).all(), name
for j, k in enumerate(_TRACKED):
    assert (caches.prev_losses[k][other] == other + j).all(), k
print("CACHES_OK")
dist.barrier("end")
print("WORKER_DONE")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_gather_and_cache_sync(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    # one device per process: the pod-like topology (not the 8-dev test mesh)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(rank), str(port), str(tmp_path), REPO],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for rank in range(2)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"rank failed:\n{out}\n{err[-3000:]}"
        assert "WORKER_DONE" in out
        assert "CACHES_OK" in out
    assert "GATHER_OK" in outs[0][0]  # rank 0 merged
