"""Streaming-tracker QUALITY study: warm tracking vs per-frame cold
refinement over synthetic motion (VERDICT r4 item 7).

The tracker's 1591 tracked hands/sec headline had no quality axis: nothing
measured whether the warm-started 4x31-step schedule drifts over long
sequences vs running the full cold opt_default schedule on every frame.
This study drives both over the SAME synthetic motion sequences:

  * motion: GT pose/trans evolve by a smoothed (OU-process) random walk at
    three speed levels; shapes fixed per stream (hands do not change
    identity mid-video). Per-frame 'detections' (the encoder surrogate)
    are GT + the standard init noise, refreshed every frame.
  * tracker leg: TwoHandTracker (streaming_strategy(30), save_mid_freq=5,
    detection blend 0.25) — warm-started from the previous frame.
  * cold leg: full opt_default (4 x 301 steps) from each frame's fresh
    noisy detection — the reference's per-image protocol.

Metrics per frame (FINAL exact, parity-filtered collision metric):
GT-joint L2 error and mean collision; drift = late-window minus
early-window error. Writes docs/tracker_study.json with per-frame arrays.

Run on the real TPU:  python scripts/tracker_study.py
Env: IHMR_TRACK_FRAMES (default 100), IHMR_TRACK_STREAMS (64),
     IHMR_TRACK_SEEDS (3).
"""

import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

FRAMES = int(os.environ.get("IHMR_TRACK_FRAMES", "100"))
STREAMS = int(os.environ.get("IHMR_TRACK_STREAMS", "64"))
SEEDS = int(os.environ.get("IHMR_TRACK_SEEDS", "3"))
SPEEDS = (0.005, 0.02, 0.05)  # per-frame pose-delta scale (rad-ish)
NOISE = 0.15  # detection noise, the standard benchmark level


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/ihmr_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ihmr_tpu.data.synthetic import _decode
    from ihmr_tpu.mano import synthetic_mano_model
    from ihmr_tpu.refine import OptConfig, opt_default, optimize_batch
    from ihmr_tpu.refine.opt_engine import OptBatch, params_from_init
    from ihmr_tpu.refine.tracker import TwoHandTracker, streaming_strategy

    dev = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    print(f"device: {dev}  frames={FRAMES} streams={STREAMS} seeds={SEEDS}", flush=True)
    model = synthetic_mano_model()
    model_dev = jax.device_put(model, dev)

    def batch_and_init(rng, pose, shape, cam, trans):
        """Decode GT on host, build (OptBatch, fresh detection params)."""
        with jax.default_device(cpu):
            _, _, j3, j2 = _decode(model, pose, shape, trans, cam)
            ones = jnp.ones((STREAMS, 42, 1), jnp.float32)
            ones1 = jnp.ones((STREAMS, 1), jnp.float32)
            det_pose = pose + rng.randn(STREAMS, 96).astype(np.float32) * NOISE
            det_shape = shape + rng.randn(STREAMS, 20).astype(np.float32) * NOISE
            det_trans = trans + rng.randn(STREAMS, 3).astype(np.float32) * NOISE * 0.2
            kp = NOISE * 0.02
            init_j3 = j3 + rng.randn(*j3.shape).astype(np.float32) * kp
            init_j2 = j2 + rng.randn(*j2.shape).astype(np.float32) * kp
            init_trans_j = init_j3[:, 21, :] - init_j3[:, 0, :]
            batch = OptBatch(
                hand_type_array=jnp.ones((STREAMS, 2), jnp.float32),
                hand_type_valid=ones1,
                joints_2d=jnp.concatenate([j2, ones], axis=-1),
                joints_3d=jnp.concatenate([j3, ones], axis=-1),
                gt_pose_params=pose,
                gt_shape_params=shape,
                mano_params_weight=jnp.ones((STREAMS, 2), jnp.float32),
                hand_trans=jnp.concatenate([trans, ones1], axis=-1)[:, None, :],
                init_joints_2d=jnp.concatenate([init_j2, ones], axis=-1),
                init_joints_3d=jnp.concatenate([init_j3, ones], axis=-1),
                init_hand_trans_j=jnp.concatenate([init_trans_j, ones1], axis=-1)[:, None, :],
            )
            det = params_from_init(cam, det_pose, det_shape, det_trans)
        return jax.device_put(batch, dev), jax.device_put(det, dev), np.asarray(j3)

    def gt_err(results, gt_j3):
        j = np.asarray(results["pred_joints_3d"])
        return float(np.mean(np.linalg.norm(j - gt_j3, axis=-1)))

    rows = []
    cold_cfg = OptConfig(save_mid_freq=10)
    track_cfg = OptConfig(save_mid_freq=5)
    for speed in SPEEDS:
        for seed in range(SEEDS):
            rng = np.random.RandomState(1000 * seed + 17)
            pose = (rng.randn(STREAMS, 96) * 0.2).astype(np.float32)
            shape = (rng.randn(STREAMS, 20) * 0.5).astype(np.float32)
            cam = np.tile(np.array([[5.0, 0.0, 0.0]], np.float32), (STREAMS, 1))
            trans = (rng.randn(STREAMS, 3) * 0.02).astype(np.float32)
            vel = np.zeros((STREAMS, 96), np.float32)
            velt = np.zeros((STREAMS, 3), np.float32)

            tracker = TwoHandTracker(
                model_dev, strategy=streaming_strategy(30), config=track_cfg
            )
            state = None
            tr_err, tr_coll, cold_err, cold_coll = [], [], [], []
            t0 = time.perf_counter()
            for t in range(FRAMES):
                # OU-smoothed random walk
                vel = 0.9 * vel + rng.randn(STREAMS, 96).astype(np.float32)
                velt = 0.9 * velt + rng.randn(STREAMS, 3).astype(np.float32)
                pose = pose + speed * vel * 0.1
                trans = trans + speed * velt * 0.01
                batch, det, gt_j3 = batch_and_init(
                    rng, jnp.asarray(pose), jnp.asarray(shape),
                    jnp.asarray(cam), jnp.asarray(trans),
                )
                if state is None:
                    state = tracker.init(det)
                state, res_t = tracker.step(state, batch, detection_params=det)
                tr_err.append(gt_err(res_t, gt_j3))
                tr_coll.append(float(jnp.mean(res_t["collision_loss"])))
                # cold leg: full schedule from the fresh detection
                _, res_c = optimize_batch(model_dev, det, batch, opt_default, cold_cfg)
                cold_err.append(gt_err(res_c, gt_j3))
                cold_coll.append(float(jnp.mean(res_c["collision_loss"])))
            dt = time.perf_counter() - t0
            early = slice(5, 20)
            late = slice(FRAMES - 15, FRAMES)
            row = dict(
                speed=speed,
                seed=seed,
                tracker_err_mean=float(np.mean(tr_err[5:])),
                cold_err_mean=float(np.mean(cold_err[5:])),
                tracker_coll_mean=float(np.mean(tr_coll[5:])),
                cold_coll_mean=float(np.mean(cold_coll[5:])),
                tracker_drift=float(np.mean(tr_err[late]) - np.mean(tr_err[early])),
                cold_drift=float(np.mean(cold_err[late]) - np.mean(cold_err[early])),
                tracker_err=[round(e, 5) for e in tr_err],
                cold_err=[round(e, 5) for e in cold_err],
                tracker_coll=[round(c, 5) for c in tr_coll],
                cold_coll=[round(c, 5) for c in cold_coll],
                seconds=round(dt, 1),
            )
            rows.append(row)
            print(
                f"speed={speed} seed={seed}: tracker err {row['tracker_err_mean']:.4f} "
                f"(drift {row['tracker_drift']:+.4f}) vs cold {row['cold_err_mean']:.4f} "
                f"(drift {row['cold_drift']:+.4f}); coll {row['tracker_coll_mean']:.3f} "
                f"vs {row['cold_coll_mean']:.3f}  ({dt:.0f}s)",
                flush=True,
            )

    out = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                   "docs", "tracker_study.json")
    with open(out, "w") as f:
        json.dump({"frames": FRAMES, "streams": STREAMS, "noise": NOISE,
                   "rows": rows}, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
