"""Benchmark: IHMR-OPT end-to-end refinement throughput on one TPU chip.

Workload (the BASELINE.json headline metric, "hands/sec (infer + OPT
refine)"): encoder inference (ResNet-50 -> 122 params) followed by the FULL
opt_default refinement — 4 stages x 301 Adam steps with the collision loss in
the loop, snapshot filter/select semantics identical to the reference
(save_mid_freq=10, matching bash/optimize.sh:11) — for a batch of images,
entirely on-device as one jitted program per stage.

The headline runs the VERIFIED default configuration: stride-2 query
sampling against the FULL mesh, lazy nearest-face reselection, and
block-frozen triangle POSITIONS (round 3: the per-step triangle-build
gather pair hoisted to the snapshot-block boundary — 129 -> 276 hands/sec).
Every fast knob is proven statistically identical to strict
every-vertex/every-step sampling by 16-seed paired studies on both the
standard and the adversarial interlocked benchmarks
(docs/quality_study.json; OptConfig docstrings). Set IHMR_BENCH_SUBSAMPLE=1
and IHMR_BENCH_FREEZE=0 for stricter configurations.

Baseline: the reference publishes no numbers (BASELINE.md). ``VS_BASELINE_
REF`` is an *estimate* of the reference pipeline on one A100: the CUDA SDF
evaluates a 32^3 grid x 1538 triangles per hand per step (~5 GFLOP/sample/
step, ~2.4 TFLOP/step at batch 512 vs ~19 fp32 TFLOP/s peak), plus 1204
sequential Python-loop steps of MANO forward/backward => >= ~120 ms/step,
~145 s per 512-sample batch ~= 3.5 hands/sec. `scripts/ref_cpu_bench.py`
provides a measured same-host anchor of the two engines on CPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

VS_BASELINE_REF = 3.5  # estimated reference hands/sec on one A100 (see docstring)
BATCH = int(os.environ.get("IHMR_BENCH_BATCH", "128"))
SUBSAMPLE = int(os.environ.get("IHMR_BENCH_SUBSAMPLE", "2"))
REPEATS = int(os.environ.get("IHMR_BENCH_REPEATS", "3"))
# freeze triangle POSITIONS per snapshot block (round-3 kernel-work removal;
# OptConfig.loop_collision_freeze_positions). Default follows OptConfig.
FREEZE = os.environ.get("IHMR_BENCH_FREEZE")
# stage-hoisted engine (round-3 exact per-stage decode specialization;
# OptConfig.stage_hoist_decode). Default follows OptConfig; set
# IHMR_BENCH_HOIST=0 to A/B against the fused scan engine.
HOIST = os.environ.get("IHMR_BENCH_HOIST")


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def _backend_init_watchdog(timeout_s: float):
    """Fail LOUDLY (one JSON line + exit) if backend init hangs.

    The axon TPU plugin dials its tunnel inside the first backend query and
    retries forever when the tunnel is down (observed round 3: >40 min).
    A bench that hangs tells the driver nothing; a bench that prints an
    explicit error line does. The timer is cancelled the moment
    jax.devices() returns."""
    import threading

    def fire():
        print(
            json.dumps(
                {
                    "metric": "hands/sec (infer + OPT refine, batch %d, 1 chip)" % BATCH,
                    "value": 0.0,
                    "unit": "hands/sec",
                    "vs_baseline": 0.0,
                    "error": f"TPU backend init exceeded {timeout_s:.0f}s "
                             "(axon tunnel unreachable?)",
                }
            ),
            flush=True,
        )
        os._exit(3)

    t = threading.Timer(timeout_s, fire)
    t.daemon = True
    t.start()
    return t


def main():
    import jax

    # persistent compilation cache: the 4 stage programs are large (scan over
    # MANO+collision+Adam); caching drops repeat-run compile time to ~0.
    jax.config.update("jax_compilation_cache_dir", "/tmp/ihmr_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from ihmr_tpu.data.synthetic import make_opt_inputs
    from ihmr_tpu.mano import synthetic_mano_model
    from ihmr_tpu.models import InterHandEncoder, build_mean_params
    from ihmr_tpu.refine import OptConfig, opt_default, optimize_batch

    watchdog = _backend_init_watchdog(
        float(os.environ.get("IHMR_BENCH_INIT_TIMEOUT", "600"))
    )
    devices = jax.devices()
    watchdog.cancel()
    log(f"devices: {devices}  batch={BATCH}")
    mano = synthetic_mano_model()  # constructed host-side

    # --- encoder inference (the "infer" part); init on host CPU (eager init
    # over the device tunnel dispatches hundreds of ops at ~30ms each)
    encoder = InterHandEncoder(arch="resnet50")
    with jax.default_device(jax.devices("cpu")[0]):
        mean_params = build_mean_params(np.zeros(48, np.float32), np.zeros(10, np.float32))
        variables = encoder.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), mean_params
        )
    images = jnp.zeros((BATCH, 224, 224, 3), jnp.float32)
    variables = jax.device_put(variables, jax.devices()[0])
    mean_params = jax.device_put(mean_params, jax.devices()[0])

    # --- OPT refinement (the hot workload); generate host-side, then pin
    # everything to the TPU once
    params, opt_batch = make_opt_inputs(mano, batch=BATCH, seed=0)
    device = jax.devices()[0]
    mano = jax.device_put(mano, device)
    params = jax.device_put(params, device)
    opt_batch = jax.device_put(opt_batch, device)
    kw = {}
    if FREEZE is not None:
        kw["loop_collision_freeze_positions"] = FREEZE == "1"
    if HOIST is not None:
        kw["stage_hoist_decode"] = HOIST == "1"
    # payload-rebuild decoupling (round 5, OptConfig.reselect_every_blocks):
    # rebuild the block-frozen selection/positions every k snapshot blocks
    if os.environ.get("IHMR_BENCH_RESELECT_K"):
        kw["reselect_every_blocks"] = int(os.environ["IHMR_BENCH_RESELECT_K"])
    config = OptConfig(save_mid_freq=10, loop_collision_subsample=SUBSAMPLE, **kw)

    # the whole pipeline — encoder inference + full refinement — is ONE
    # compiled program: one device dispatch per batch (the tunneled TPU
    # costs ~10-30 ms per dispatch), and the TPU-idiomatic serving shape
    @jax.jit
    def pipeline(variables, images, params, opt_batch):
        # returning the encoder outputs keeps the inference live (XLA would
        # otherwise dead-code-eliminate it, since the bench refines the
        # synthetic prediction rather than the encoder's)
        pred_params, hand_type = encoder.apply(variables, images, mean_params)
        out_params, results = optimize_batch(mano, params, opt_batch, opt_default, config)
        return out_params, results, pred_params, hand_type

    t0 = time.perf_counter()
    out = pipeline(variables, images, params, opt_batch)
    jax.block_until_ready(out)
    out_params, results = out[0], out[1]
    log(f"compile+first run: {time.perf_counter() - t0:.1f}s")

    times = []
    for r in range(REPEATS):
        t0 = time.perf_counter()
        out = pipeline(variables, images, params, opt_batch)
        jax.block_until_ready(out)
        out_params, results = out[0], out[1]
        dt = time.perf_counter() - t0
        times.append(dt)
        log(f"run {r}: {dt:.2f}s -> {BATCH / dt:.2f} hands/sec")

    best = min(times)
    hands_per_sec = BATCH / best
    final_coll = float(jnp.mean(results["collision_loss"]))
    log(f"final mean collision loss: {final_coll:.5f} (sanity: finite={np.isfinite(final_coll)})")

    if os.environ.get("IHMR_BENCH_STREAMING"):
        # streaming-video mode: warm-started short-schedule tracking
        # (BASELINE.json config #5). Reported to stderr only.
        from ihmr_tpu.refine.tracker import TwoHandTracker, streaming_strategy

        tracker = TwoHandTracker(
            mano, strategy=streaming_strategy(30), config=OptConfig(save_mid_freq=5)
        )
        tstate = tracker.init(params)
        tstate, _ = tracker.step(tstate, opt_batch)  # compile
        jax.block_until_ready(tstate.params)
        t0 = time.perf_counter()
        frames = 5
        for _ in range(frames):
            tstate, _ = tracker.step(tstate, opt_batch)
        jax.block_until_ready(tstate.params)
        dt = time.perf_counter() - t0
        log(
            f"streaming: {frames} frames x {BATCH} streams in {dt:.2f}s -> "
            f"{frames * BATCH / dt:.1f} tracked hands/sec "
            f"({dt / frames * 1000:.0f} ms/frame-batch)"
        )

    print(
        json.dumps(
            {
                "metric": "hands/sec (infer + OPT refine, batch %d, 1 chip)" % BATCH,
                "value": round(hands_per_sec, 3),
                "unit": "hands/sec",
                "vs_baseline": round(hands_per_sec / VS_BASELINE_REF, 3),
                # vs_baseline divides by an ANALYTICAL estimate of the
                # reference on one A100 (3.5 hands/sec; see module docstring
                # + BASELINE.md) — the reference publishes no numbers and its
                # CUDA stack cannot run here. Not a measured ratio.
                "baseline_basis": "a100_estimate",
            }
        )
    )


if __name__ == "__main__":
    main()
