"""Capture a jax.profiler trace of the fused OPT stage and print the top
device ops by total time (parsed from the trace.json.gz event dump).

    python scripts/trace_step.py [batch] [sub] [fsub]

Feeds the trace-driven optimization workflow in docs/PERFORMANCE.md.
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128
SUB = int(sys.argv[2]) if len(sys.argv) > 2 else 2
FSUB = int(sys.argv[3]) if len(sys.argv) > 3 else 2
TRACE_DIR = os.environ.get("IHMR_TRACE_DIR", "/tmp/ihmr_trace")


def main():
    import dataclasses

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ihmr_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ihmr_tpu.data.synthetic import make_opt_inputs
    from ihmr_tpu.mano import synthetic_mano_model
    from ihmr_tpu.refine import OptConfig, opt_default
    from ihmr_tpu.refine.opt_engine import run_all_stages_fused

    dev = jax.devices()[0]
    print(f"device: {dev} batch={BATCH} sub={SUB} fsub={FSUB}")
    model = synthetic_mano_model()
    params, batch = make_opt_inputs(model, batch=BATCH, seed=0)
    model, params, batch = jax.device_put((model, params, batch), dev)
    cfg = OptConfig(
        save_mid_freq=10, loop_collision_subsample=SUB, loop_collision_face_subsample=FSUB
    )
    strategy = tuple(dataclasses.replace(s, epoch=100) for s in opt_default[:1])
    fused = jax.jit(lambda p: run_all_stages_fused(model, p, batch, strategy, cfg))
    jax.block_until_ready(fused(params))  # compile + warm

    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        jax.block_until_ready(fused(params))

    traces = glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True)
    assert traces, f"no trace under {TRACE_DIR}"
    with gzip.open(traces[0], "rt") as f:
        data = json.load(f)

    # device op events live on the TPU pid's "XLA Ops" thread line
    tnames = {}
    for ev in data["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tnames[(ev["pid"], ev["tid"])] = ev["args"]["name"]
    tot = defaultdict(float)
    cnt = defaultdict(int)
    wall = 0.0
    for ev in data["traceEvents"]:
        if (
            ev.get("ph") == "X"
            and "dur" in ev
            and tnames.get((ev.get("pid"), ev.get("tid"))) == "XLA Ops"
        ):
            name = ev["name"]
            tot[name] += ev["dur"]
            cnt[name] += 1
            wall += ev["dur"]
    print(f"\ntotal TensorCore busy: {wall / 1e3:.2f} ms over {sum(cnt.values())} events")
    print(f"{'op':<72s} {'total ms':>9s} {'count':>6s}")
    for name, t in sorted(tot.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{name[:72]:<72s} {t / 1e3:9.3f} {cnt[name]:6d}")


if __name__ == "__main__":
    main()
