"""Capture a jax.profiler trace of ONE hoisted OPT stage program and print
the top device ops by total time (same xplane parsing as trace_step.py).

    python scripts/trace_stage.py [stage_idx] [batch] [steps]

The stage-hoisted engine (OptConfig.stage_hoist_decode) compiles one program
per stage; this tool answers "where do the trans stage's ~246 us/step go"
with measured fusion names instead of guesses (docs/PERFORMANCE.md).
"""

import dataclasses
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGE = int(sys.argv[1]) if len(sys.argv) > 1 else 0
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 128
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 100
TRACE_DIR = os.environ.get("IHMR_TRACE_DIR", "/tmp/ihmr_trace_stage")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ihmr_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ihmr_tpu.data.synthetic import make_opt_inputs
    from ihmr_tpu.mano import synthetic_mano_model
    from ihmr_tpu.refine import OptConfig, opt_default
    from ihmr_tpu.refine.opt_engine import _run_one_stage_hoisted

    dev = jax.devices()[0]
    print(f"device: {dev} stage={STAGE} batch={BATCH} steps={STEPS}")
    model = synthetic_mano_model()
    params, batch = make_opt_inputs(model, batch=BATCH, seed=0)
    model, params, batch = jax.device_put((model, params, batch), dev)
    cfg = OptConfig(save_mid_freq=10)
    stage = dataclasses.replace(opt_default[STAGE], epoch=STEPS)
    fn = jax.jit(lambda p: _run_one_stage_hoisted(model, p, batch, stage, cfg))
    jax.block_until_ready(fn(params))  # compile + warm

    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        jax.block_until_ready(fn(params))

    traces = glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True)
    assert traces, f"no trace under {TRACE_DIR}"
    with gzip.open(traces[0], "rt") as f:
        data = json.load(f)

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
    nsteps = STEPS + 1
    print(f"\ntotal TensorCore busy: {wall / 1e3:.2f} ms over {sum(cnt.values())} events"
          f"  ({wall / nsteps:.1f} us/step incl. payload rebuilds)")
    print(f"{'op':<72s} {'total ms':>9s} {'count':>6s} {'us/step':>8s}")
    for name, t in sorted(tot.items(), key=lambda kv: -kv[1])[:35]:
        print(f"{name[:72]:<72s} {t / 1e3:9.3f} {cnt[name]:6d} {t / nsteps:8.2f}")


if __name__ == "__main__":
    main()
