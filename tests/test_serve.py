"""Batched inference serving (ihmr_tpu.serve): micro-batcher semantics +
HTTP contract, driven over real sockets with the real jitted pipeline.

The reference has no serving layer; this subsystem is the rebuild's
production-deployment surface (SURVEY: "intended for large-scale production
deployment and serving"). Tests run the tiny resnet18 encoder + synthetic
MANO on the CPU backend.
"""

from __future__ import annotations

import json
import threading
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def predict_fn():
    import jax
    import jax.numpy as jnp

    from ihmr_tpu.mano import synthetic_mano_model
    from ihmr_tpu.models import InterHandEncoder, build_mean_params
    from ihmr_tpu.serve import build_encoder_predict_fn

    encoder = InterHandEncoder(arch="resnet18")
    mean_params = build_mean_params(np.zeros(48, np.float32), np.zeros(10, np.float32))
    variables = encoder.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), mean_params)
    mano = synthetic_mano_model()
    return build_encoder_predict_fn(encoder, variables, mean_params, mano, 64)


def test_microbatcher_batches_and_pads(predict_fn):
    from ihmr_tpu.serve import MicroBatcher

    calls = []

    def counting_fn(batch):
        calls.append(batch.shape[0])
        return predict_fn(batch)

    b = MicroBatcher(counting_fn, batch_size=4, max_wait_ms=50)
    try:
        xs = [np.random.RandomState(i).rand(64, 64, 3).astype(np.float32) for i in range(3)]
        outs = b.predict_many(xs)
        assert len(outs) == 3
        for out in outs:
            assert out["params"].shape == (122,)
            assert out["joints_3d"].shape == (42, 3)
            assert np.isfinite(out["joints_3d"]).all()
        # 3 requests co-batched into ONE padded program call
        assert calls == [4]
        s = b.stats()
        assert s["requests"] == 3 and s["batches"] == 1 and s["padded_slots"] == 1
        assert s["batch_efficiency"] == 0.75
    finally:
        b.stop()


def test_microbatcher_result_routing(predict_fn):
    """Each caller gets ITS OWN sample's result (not a mixup)."""
    from ihmr_tpu.serve import MicroBatcher

    b = MicroBatcher(predict_fn, batch_size=4, max_wait_ms=50)
    try:
        xs = [np.full((64, 64, 3), i / 10, np.float32) for i in range(4)]
        outs = b.predict_many(xs)
        # direct single-sample evaluation must match the batched route
        for x, out in zip(xs, outs):
            direct = {k: np.asarray(v)[0] for k, v in predict_fn(x[None]).items()}
            np.testing.assert_allclose(out["params"], direct["params"], atol=2e-5)
    finally:
        b.stop()


def test_microbatcher_error_propagates():
    from ihmr_tpu.serve import MicroBatcher

    def broken(batch):
        raise ValueError("boom")

    b = MicroBatcher(broken, batch_size=2, max_wait_ms=5)
    try:
        with pytest.raises(RuntimeError, match="boom"):
            b.predict(np.zeros((64, 64, 3), np.float32))
    finally:
        b.stop()


@pytest.fixture()
def server(predict_fn):
    from ihmr_tpu.serve import InferenceServer, MicroBatcher

    batcher = MicroBatcher(predict_fn, batch_size=4, max_wait_ms=20)
    srv = InferenceServer(batcher, (64, 64, 3))
    srv.start(0)
    yield srv
    srv.stop()


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=10) as r:
        return r.status, json.loads(r.read())


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, json.loads(r.read())


def test_http_healthz_and_stats(server):
    assert _get(server.port, "/healthz") == (200, {"status": "ok"})
    status, stats = _get(server.port, "/stats")
    assert status == 200 and "queue_depth" in stats


def test_http_predict_end_to_end(server):
    imgs = np.random.RandomState(0).rand(2, 64, 64, 3).tolist()
    status, body = _post(server.port, "/predict", {"images": imgs})
    assert status == 200
    results = body["results"]
    assert len(results) == 2
    for r in results:
        assert len(r["params"]) == 122
        assert len(r["joints_3d"]) == 42
        assert len(r["hand_type"]) == 2


def test_http_bad_input_is_400(server):
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(server.port, "/predict", {"images": [[1, 2, 3]]})
    assert exc.value.code == 400


def test_concurrent_requests_share_batches(server):
    """8 parallel single-image requests against batch_size=4 must all
    succeed and use fewer than 8 program calls."""
    errs = []

    def one(i):
        try:
            img = np.full((64, 64, 3), i / 20, np.float32).tolist()
            status, body = _post(server.port, "/predict", {"images": [img]})
            assert status == 200 and len(body["results"]) == 1
        except Exception as e:  # pragma: no cover - surfaced via errs
            errs.append(e)

    threads = [threading.Thread(target=one, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    stats = server.batcher.stats()
    assert stats["requests"] >= 8
    assert stats["batches"] < stats["requests"]  # co-batching happened
