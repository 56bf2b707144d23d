"""Binary-serving round-trip latency on the real TPU (VERDICT r4 item 4).

Starts the real inference server (MicroBatcher + ThreadingHTTPServer +
build_encoder_predict_fn on the chip), warms the jitted program, then
measures the client-observed wall latency of 8-image requests:

  * ``application/octet-stream`` raw fp32 in, uncompressed npz out
    (the round-4 binary path; round-3 target p95 < 200 ms)
  * ``application/json`` float lists in/out (the round-3 path, for the
    speedup ratio)

Prints p50/p95/max over N sequential requests. Results recorded in
BASELINE.md (serving row) and used to tighten tests/test_serve.py's p95
bound.

Run:  python scripts/serve_bench.py [n_requests]
"""

import io
import json
import os.path as osp
import sys
import time
import urllib.request

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 30
IMAGES = 8
SIZE = 224


def post(url, body, ctype):
    req = urllib.request.Request(url, data=body, headers={"Content-Type": ctype})
    t0 = time.perf_counter()
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            payload = resp.read()
    except urllib.error.HTTPError as e:
        raise RuntimeError(f"HTTP {e.code}: {e.read()[:300]!r}") from e
    return time.perf_counter() - t0, payload


def pct(lat, q):
    lat = sorted(lat)
    return lat[min(len(lat) - 1, max(0, int(q * len(lat)) - 1))]


def main():
    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/ihmr_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ihmr_tpu.mano import synthetic_mano_model
    from ihmr_tpu.models import InterHandEncoder, build_mean_params
    from ihmr_tpu.serve import InferenceServer, MicroBatcher, build_encoder_predict_fn

    print("devices:", jax.devices(), flush=True)
    dev = jax.devices()[0]
    mano = synthetic_mano_model()
    encoder = InterHandEncoder(arch="resnet50")
    with jax.default_device(jax.devices("cpu")[0]):
        import jax.numpy as jnp

        mean_params = build_mean_params(np.zeros(48, np.float32), np.zeros(10, np.float32))
        variables = encoder.init(
            jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)), mean_params
        )
    variables = jax.device_put(variables, dev)
    mean_params = jax.device_put(mean_params, dev)
    mano = jax.device_put(mano, dev)
    predict = build_encoder_predict_fn(encoder, variables, mean_params, mano, SIZE)

    batcher = MicroBatcher(predict, batch_size=16, input_shape=(SIZE, SIZE, 3))
    srv = InferenceServer(batcher, (SIZE, SIZE, 3))
    port = srv.start(0)
    url = f"http://localhost:{port}/predict"

    rng = np.random.RandomState(0)
    imgs = rng.rand(IMAGES, SIZE, SIZE, 3).astype(np.float32)

    # warm the compiled program IN-PROCESS with a compile-sized timeout (the
    # HTTP path's 30 s predict timeout is a serving bound, not a compile one)
    t0 = time.perf_counter()
    batcher.predict_many(list(imgs), timeout=900.0)
    print(f"warmup (compile): {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    post(url, imgs.tobytes(), "application/octet-stream")
    print(f"first http round trip (warm): {time.perf_counter() - t0:.2f}s", flush=True)

    results = {}
    for name, body, ctype in (
        ("octet-stream fp32", imgs.tobytes(), "application/octet-stream"),
        ("npy", None, "application/x-npy"),
        ("json", json.dumps({"images": imgs.tolist()}).encode(), "application/json"),
    ):
        if name == "npy":
            buf = io.BytesIO()
            np.save(buf, imgs, allow_pickle=False)
            body = buf.getvalue()
        lat = []
        for _ in range(N):
            dt, payload = post(url, body, ctype)
            lat.append(dt)
        results[name] = dict(
            p50_ms=1e3 * pct(lat, 0.50),
            p95_ms=1e3 * pct(lat, 0.95),
            max_ms=1e3 * max(lat),
            resp_bytes=len(payload),
        )
        print(
            f"{name:18s}: p50 {results[name]['p50_ms']:7.1f} ms  "
            f"p95 {results[name]['p95_ms']:7.1f} ms  "
            f"max {results[name]['max_ms']:7.1f} ms  "
            f"resp {len(payload)/1e3:.0f} kB  (n={N}, {IMAGES} images/req)",
            flush=True,
        )

    print(json.dumps(results))
    srv.stop()


if __name__ == "__main__":
    main()
