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


def _post_binary(port, body, ctype, timeout=60):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict",
        data=body,
        headers={"Content-Type": ctype},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_http_predict_raw_fp32_roundtrip(server):
    """Round-4 binary payload: raw little-endian fp32 in, npz out — and the
    outputs must MATCH the JSON path bit-for-bit (same program, same batch
    semantics)."""
    import io

    rng = np.random.RandomState(1)
    imgs = rng.rand(3, 64, 64, 3).astype(np.float32)
    status, ctype, body = _post_binary(
        server.port, imgs.tobytes(), "application/octet-stream"
    )
    assert status == 200 and ctype == "application/x-npz"
    out = np.load(io.BytesIO(body))
    assert out["params"].shape == (3, 122)
    assert out["joints_3d"].shape == (3, 42, 3)
    assert out["hand_type"].shape == (3, 2)

    status, js = _post(server.port, "/predict", {"images": imgs.tolist()})
    assert status == 200
    want = np.asarray([r["params"] for r in js["results"]], np.float32)
    np.testing.assert_allclose(out["params"], want, atol=1e-6)


def test_http_predict_npy_roundtrip(server):
    import io

    rng = np.random.RandomState(2)
    imgs = rng.rand(2, 64, 64, 3).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, imgs)
    status, ctype, body = _post_binary(server.port, buf.getvalue(), "application/x-npy")
    assert status == 200 and ctype == "application/x-npz"
    out = np.load(io.BytesIO(body))
    assert out["params"].shape == (2, 122)

    # single-sample npy (no batch dim) works too
    buf = io.BytesIO()
    np.save(buf, imgs[0])
    status, _, body = _post_binary(server.port, buf.getvalue(), "application/x-npy")
    assert status == 200
    assert np.load(io.BytesIO(body))["params"].shape == (1, 122)


def test_http_predict_raw_bad_length_is_400(server):
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post_binary(server.port, b"\x00" * 37, "application/octet-stream")
    assert exc.value.code == 400


def test_bad_sample_fails_its_caller_not_the_broker(predict_fn):
    """A malformed sample (wrong shape / non-numeric) must fail ITS OWN
    submit/predict call; the broker thread survives and later good requests
    still succeed (round-2 advisor: an unguarded np.stack killed the broker
    permanently)."""
    from ihmr_tpu.serve import MicroBatcher

    b = MicroBatcher(predict_fn, batch_size=2, max_wait_ms=5, input_shape=(64, 64, 3))
    try:
        with pytest.raises(ValueError, match="shape"):
            b.predict(np.zeros((3, 3), np.float32))
        with pytest.raises((TypeError, ValueError)):
            b.predict(np.asarray(object()))  # non-numeric payload
        # broker still alive: a good request round-trips
        out = b.predict(np.zeros((64, 64, 3), np.float32))
        assert out["params"].shape == (122,)
        # even a ragged batch assembled in the broker (no input_shape check)
        # must only fail its own waiters
        b2 = MicroBatcher(predict_fn, batch_size=2, max_wait_ms=50)
        try:
            h_bad = b2.submit(np.zeros((3, 3), np.float32))
            h_bad2 = b2.submit(np.zeros((64, 64, 3), np.float32))
            with pytest.raises(RuntimeError):
                b2.wait(h_bad)
            with pytest.raises(RuntimeError):
                b2.wait(h_bad2)  # same batch -> same failure
            out = b2.predict(np.zeros((64, 64, 3), np.float32))
            assert out["params"].shape == (122,)
        finally:
            b2.stop()
    finally:
        b.stop()


def test_saturation_raises_and_http_503():
    """A full bounded queue rejects synchronously (ServerSaturated) and the
    HTTP layer maps it to 503 — backpressure, not unbounded latency."""
    import time

    from ihmr_tpu.serve import InferenceServer, MicroBatcher, ServerSaturated

    release = threading.Event()

    def slow_fn(batch):
        release.wait(10)
        return {"y": np.zeros((batch.shape[0], 1), np.float32)}

    b = MicroBatcher(slow_fn, batch_size=1, max_wait_ms=1, max_queue=2)
    srv = InferenceServer(b, (4, 4, 3))
    srv.start(0)
    try:
        x = np.zeros((4, 4, 3), np.float32)
        handles = [b.submit(x)]  # taken by the broker, blocks in slow_fn
        time.sleep(0.1)
        handles += [b.submit(x), b.submit(x)]  # fills the 2-slot queue
        with pytest.raises(ServerSaturated):
            b.submit(x)
        # HTTP surface: saturated -> 503 with a retry hint
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(srv.port, "/predict", {"images": [x.tolist()]})
        assert exc.value.code == 503
        assert b.stats()["rejected"] >= 2
        release.set()  # drain
        for h in handles:
            b.wait(h)
    finally:
        release.set()
        srv.stop()


def test_concurrent_load_latency_and_efficiency(server):
    """Sustained concurrent load: 24 requests from 8 threads must all
    succeed with bounded p95 latency and real co-batching."""
    import time

    lat: list = []
    errs: list = []
    lock = threading.Lock()

    def worker(tid):
        try:
            for j in range(3):
                img = np.full((64, 64, 3), (tid * 3 + j) / 100, np.float32).tolist()
                t0 = time.perf_counter()
                status, body = _post(server.port, "/predict", {"images": [img]})
                dt = time.perf_counter() - t0
                assert status == 200 and len(body["results"]) == 1
                with lock:
                    lat.append(dt)
        except Exception as e:  # pragma: no cover - surfaced via errs
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert len(lat) == 24
    lat.sort()
    p95 = lat[int(0.95 * len(lat)) - 1]
    # generous CI bound: each request is one <=20ms wait + one tiny program
    assert p95 < 10.0, f"p95 latency {p95:.2f}s"
    stats = server.batcher.stats()
    assert stats["batches"] < stats["requests"]  # co-batching under load
    assert stats["batch_efficiency"] > 0.25


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
