"""Batched inference serving for IHMR models.

The reference is a research pipeline with no serving layer; this module adds
the production-deployment surface the TPU rebuild is meant for: a
micro-batching request broker in front of the jitted predict function, plus
a thin HTTP front end.

Design (TPU-first):
  * ONE jitted program at a FIXED batch size (TPU programs are compiled per
    shape; padding to a fixed batch keeps a single hot executable).
  * A broker thread collects requests for up to ``max_wait_ms`` or until the
    batch is full, pads with the first request, runs the program once, and
    fans results back out — classic micro-batching; per-request latency is
    bounded by max_wait + one program execution.
  * The HTTP layer is stdlib-only (TPU pods have no egress for deps):
    POST /predict, content negotiated by Content-Type —
      - application/json (default): {"images": [[H,W,3] float lists, ...]}
        -> {"results": [{"params": ..., "joints_3d": ...}, ...]}. Easy to
        poke with curl, but float lists dominate the round trip (~1 s for a
        3-image request; round-3 measurement).
      - application/octet-stream: raw little-endian fp32, C-order,
        (N, H, W, 3) — zero parse cost. Response is an uncompressed .npz
        (application/x-npz) of stacked outputs; np.load(BytesIO(body)).
      - application/x-npy: a single .npy array (N, H, W, 3) or (H, W, 3);
        same .npz response.
    GET /healthz; GET /stats (queue depth, batches run, padding efficiency).

`python -m ihmr_tpu.cli serve --port ...` wires this to a trained encoder;
see tests/test_serve.py for the contract.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Dict, List, Optional

import numpy as np


class ServerSaturated(RuntimeError):
    """Raised by submit() when the bounded request queue is full (the HTTP
    layer maps this to 503 so callers get backpressure, not unbounded
    latency)."""


class MicroBatcher:
    """Collects single requests into fixed-size padded batches for a jitted
    predict function ``fn(batch_input) -> dict of arrays`` (leading batch
    dim on every output).

    Backpressure: the request queue is BOUNDED (``max_queue`` slots, default
    8 full batches); when it is full, submit() raises ServerSaturated
    immediately instead of queueing unbounded work. Per-sample validation:
    when ``input_shape`` is given, a wrong-shaped/non-numeric sample fails
    its own submit() call — it can never reach the broker thread (a bad
    sample inside a batch previously killed the broker; advisor finding)."""

    def __init__(
        self,
        fn: Callable,
        batch_size: int,
        max_wait_ms: float = 10.0,
        max_queue: Optional[int] = None,
        input_shape=None,
    ):
        self.fn = fn
        self.batch_size = batch_size
        self.max_wait = max_wait_ms / 1000.0
        self.input_shape = tuple(input_shape) if input_shape is not None else None
        if max_queue is None:
            max_queue = 8 * batch_size
        self._q: "queue.Queue" = queue.Queue(maxsize=max_queue)
        self._stats = {"requests": 0, "batches": 0, "padded_slots": 0, "rejected": 0}
        self._lock = threading.Lock()
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------- client
    def submit(self, x: np.ndarray):
        """Enqueue ONE sample (no batch dim); returns a handle for wait().

        Raises ValueError on a malformed sample, ServerSaturated on a full
        queue — both synchronously, in the caller's thread."""
        x = np.asarray(x, np.float32)  # non-numeric payloads fail HERE
        if self.input_shape is not None and x.shape != self.input_shape:
            raise ValueError(f"sample shape {x.shape} != expected {self.input_shape}")
        done = threading.Event()
        slot: Dict = {}
        try:
            self._q.put_nowait((x, slot, done))
        except queue.Full:
            with self._lock:
                self._stats["rejected"] += 1
            raise ServerSaturated(
                f"request queue full ({self._q.maxsize} pending)"
            ) from None
        return slot, done

    @staticmethod
    def wait(handle, timeout: float = 30.0) -> Dict[str, np.ndarray]:
        slot, done = handle
        if not done.wait(timeout):
            raise TimeoutError("predict timed out")
        if "error" in slot:
            raise RuntimeError(slot["error"])
        return slot["out"]

    def predict(self, x: np.ndarray, timeout: float = 30.0) -> Dict[str, np.ndarray]:
        """Submit ONE sample (no batch dim); blocks until its result."""
        return self.wait(self.submit(x), timeout)

    def predict_many(self, xs, timeout: float = 30.0) -> List[Dict[str, np.ndarray]]:
        """Submit ALL samples first (so they co-batch), then gather."""
        handles = [self.submit(x) for x in xs]
        return [self.wait(h, timeout) for h in handles]

    # ------------------------------------------------------------- broker
    def _loop(self):
        while self._running:
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            items = [first]
            deadline = time.monotonic() + self.max_wait
            while len(items) < self.batch_size:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    items.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            n = len(items)
            pad = self.batch_size - n
            try:
                # assembly INSIDE the try: a ragged/bad sample that slipped
                # past submit() validation fails this batch's waiters, not
                # the broker thread (advisor finding, round 2)
                xs = [np.asarray(x) for x, _, _ in items]
                batch = np.stack(xs + [xs[0]] * pad, axis=0)
                out = self.fn(batch)
                out = {k: np.asarray(v) for k, v in out.items()}
                for i, (_, slot, done) in enumerate(items):
                    slot["out"] = {k: v[i] for k, v in out.items()}
                    done.set()
            except Exception as e:  # propagate to all waiters
                for _, slot, done in items:
                    slot["error"] = repr(e)
                    done.set()
            with self._lock:
                self._stats["requests"] += n
                self._stats["batches"] += 1
                self._stats["padded_slots"] += pad

    def stats(self) -> Dict:
        with self._lock:
            s = dict(self._stats)
        s["queue_depth"] = self._q.qsize()
        if s["batches"]:
            total = s["batches"] * self.batch_size
            s["batch_efficiency"] = round(1.0 - s["padded_slots"] / total, 4)
        return s

    def stop(self):
        self._running = False
        self._thread.join(timeout=2)


class InferenceServer:
    """HTTP front end over a MicroBatcher."""

    def __init__(self, batcher: MicroBatcher, input_shape):
        self.batcher = batcher
        self.input_shape = tuple(input_shape)
        self._server: Optional[ThreadingHTTPServer] = None
        self.port: Optional[int] = None

    def start(self, port: int = 0) -> int:
        srv = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _send(self, code: int, payload: Dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _send_bytes(self, code: int, body: bytes, ctype: str):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._send(200, {"status": "ok"})
                elif self.path == "/stats":
                    self._send(200, srv.batcher.stats())
                else:
                    self._send(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/predict":
                    self._send(404, {"error": "not found"})
                    return
                ctype = self.headers.get("Content-Type", "application/json")
                binary = ctype.startswith("application/octet-stream") or ctype.startswith(
                    "application/x-npy"
                )
                try:
                    length = int(self.headers.get("Content-Length", "0"))
                    body = self.rfile.read(length)
                    if binary:
                        # binary payloads (round 4): the JSON float lists
                        # dominated the round trip (~1 s for 3 images); raw
                        # fp32 / npy in, uncompressed npz out
                        import io

                        if ctype.startswith("application/x-npy"):
                            images = np.load(io.BytesIO(body), allow_pickle=False)
                        else:
                            per = int(np.prod(srv.input_shape)) * 4
                            if per == 0 or len(body) % per != 0:
                                self._send(400, {
                                    "error": f"octet-stream body of {len(body)} bytes "
                                             f"is not a multiple of one fp32 sample "
                                             f"({per} bytes, shape {srv.input_shape})"})
                                return
                            images = np.frombuffer(body, np.float32).reshape(
                                (-1,) + srv.input_shape
                            )
                        images = np.asarray(images, np.float32)
                    else:
                        req = json.loads(body)
                        images = np.asarray(req["images"], np.float32)
                    if images.ndim == len(srv.input_shape):  # single sample
                        images = images[None]
                    if images.shape[1:] != srv.input_shape:
                        # explicit check, not assert: must survive python -O
                        self._send(400, {
                            "error": f"input shape {images.shape[1:]} != "
                                     f"expected {srv.input_shape}"})
                        return
                    results = srv.batcher.predict_many(list(images))
                    if binary:
                        import io

                        stacked = {
                            k: np.stack([r[k] for r in results]) for k in results[0]
                        }
                        buf = io.BytesIO()
                        np.savez(buf, **stacked)  # uncompressed: speed > size
                        self._send_bytes(200, buf.getvalue(), "application/x-npz")
                        return
                    outs: List[Dict] = [
                        {k: v.tolist() for k, v in out.items()} for out in results
                    ]
                    self._send(200, {"results": outs})
                except ServerSaturated as e:
                    self._send(503, {"error": str(e), "retry_after_ms": 100})
                except Exception as e:
                    self._send(400, {"error": repr(e)})

        self._server = ThreadingHTTPServer(("0.0.0.0", port), Handler)
        self.port = self._server.server_address[1]
        threading.Thread(target=self._server.serve_forever, daemon=True).start()
        print(f"[serve] inference server at http://localhost:{self.port}/", flush=True)
        return self.port

    def stop(self):
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None
        self.batcher.stop()


def build_encoder_predict_fn(encoder, variables, mean_params, mano_right, input_size: int):
    """images (B, S, S, 3) float [0,1] -> dict(params 122, joints_3d 42x3,
    joints_2d 42x2, hand_type 2): the IHMR-Baseline inference pipeline as one
    jitted program (normalization matching the reference's Normalize(.5,.5))."""
    import jax
    import jax.numpy as jnp

    from ihmr_tpu.core.projection import orthographic_project
    from ihmr_tpu.mano.layer import HandParams, two_hand_decode_mirrored

    @jax.jit
    def _predict_packed(images):
        x = (images - 0.5) / 0.5
        params, hand_type = encoder.apply(variables, x, mean_params)
        hp = HandParams.from_flat(params)
        _, _, joints3d = two_hand_decode_mirrored(
            mano_right,
            hp.right_orient, hp.left_orient,
            hp.right_pose, hp.left_pose,
            hp.right_shape, hp.left_shape,
            hp.trans,
        )
        joints2d = orthographic_project(joints3d, hp.cam)
        B = params.shape[0]
        # pack all outputs into ONE (B, 334) array: a single device->host
        # fetch instead of four — each fetch over the tunneled chip costs a
        # full RPC round trip (round-5 serve_bench decomposition: the 4-key
        # fan-out was ~95 ms of the ~360 ms request p50)
        return jnp.concatenate(
            [params, joints3d.reshape(B, 126), joints2d.reshape(B, 84), hand_type],
            axis=1,
        )

    def predict(images):
        packed = np.asarray(_predict_packed(images))  # one transfer
        B = packed.shape[0]
        return {
            "params": packed[:, :122],
            "joints_3d": packed[:, 122:248].reshape(B, 42, 3),
            "joints_2d": packed[:, 248:332].reshape(B, 42, 2),
            "hand_type": packed[:, 332:334],
        }

    return predict
