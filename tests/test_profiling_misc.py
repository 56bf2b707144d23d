import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ihmr_tpu.train import profiling


class TestProfiling:
    def test_trace_writes_profile(self, tmp_path):
        with profiling.trace(str(tmp_path)):
            with profiling.annotate("matmul"):
                x = jnp.ones((64, 64))
                jax.block_until_ready(jax.jit(lambda a: a @ a)(x))
        # jax writes plugins/profile/<ts>/*.xplane.pb under the log dir
        found = []
        for root, _dirs, files in os.walk(tmp_path):
            found += [f for f in files if f.endswith((".xplane.pb", ".trace.json.gz"))]
        assert found, "no trace artifacts written"

    def test_trace_disabled_noop(self, tmp_path):
        with profiling.trace(str(tmp_path), enabled=False):
            pass
        assert not any(os.scandir(tmp_path))


class TestLoaderEdges:
    def test_drop_last(self):
        from ihmr_tpu.data import BatchLoader

        class DS:
            def __len__(self):
                return 10

            def __getitem__(self, i):
                return {"index": np.asarray(i)}

        full = list(BatchLoader(DS(), 4, prefetch=0))
        assert [len(b["index"]) for b in full] == [4, 4, 2]
        dropped = list(BatchLoader(DS(), 4, drop_last=True, prefetch=0))
        assert [len(b["index"]) for b in dropped] == [4, 4]
        assert len(BatchLoader(DS(), 4, drop_last=True)) == 2
        assert len(BatchLoader(DS(), 4)) == 3

    def test_world_padding(self):
        from ihmr_tpu.data import BatchLoader

        class DS:
            def __len__(self):
                return 5  # not divisible by world=2

            def __getitem__(self, i):
                return {"index": np.asarray(i)}

        seen = []
        for rank in range(2):
            for b in BatchLoader(DS(), 2, rank=rank, world_size=2, prefetch=0):
                seen += b["index"].tolist()
        # DistributedSampler contract: padded to 6 samples, every rank 3
        assert len(seen) == 6
        assert set(seen) == {0, 1, 2, 3, 4}


class TestNativeBuild:
    def test_force_rebuild(self):
        from ihmr_tpu import native
        from ihmr_tpu.native.build import build

        if not native.available():
            pytest.skip("toolchain unavailable")
        path = build(force=True)
        assert os.path.exists(path)
