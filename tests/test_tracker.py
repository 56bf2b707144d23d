import dataclasses

import numpy as np

from ihmr_tpu.data.synthetic import make_opt_inputs
from ihmr_tpu.mano import synthetic_mano_model
from ihmr_tpu.refine import OptConfig
from ihmr_tpu.refine.tracker import TwoHandTracker, streaming_strategy


def test_streaming_strategy_shape():
    s = streaming_strategy(12)
    assert len(s) == 4
    assert all(st.epoch == 12 for st in s)


def test_tracker_steps_and_smooths():
    model = synthetic_mano_model()
    params, frame = make_opt_inputs(model, batch=2, seed=0, noise=0.1)
    tracker = TwoHandTracker(
        model,
        strategy=streaming_strategy(3),
        config=OptConfig(save_mid_freq=1, num_candidates=4),
        smoothing=0.5,
    )
    state = tracker.init(params)
    state1, results1 = tracker.step(state, frame)
    assert int(state1.frame_idx) == 1
    assert results1["pred_joints_3d"].shape == (2, 42, 3)
    assert np.isfinite(np.asarray(results1["pred_joints_3d"])).all()

    # second frame warm-starts from the first frame's refined params
    _params2, frame2 = make_opt_inputs(model, batch=2, seed=1, noise=0.1)
    state2, results2 = tracker.step(state1, frame2)
    assert int(state2.frame_idx) == 2
    # EMA output must lie between consecutive raw params
    for k in state2.params:
        ema = np.asarray(state2.ema_params[k])
        lo = np.minimum(np.asarray(state1.ema_params[k]), np.asarray(state2.params[k]))
        hi = np.maximum(np.asarray(state1.ema_params[k]), np.asarray(state2.params[k]))
        assert np.all(ema >= lo - 1e-6) and np.all(ema <= hi + 1e-6)


def test_detection_blend():
    model = synthetic_mano_model()
    params, frame = make_opt_inputs(model, batch=2, seed=2, noise=0.1)
    tracker = TwoHandTracker(
        model,
        strategy=streaming_strategy(1),
        config=OptConfig(save_mid_freq=1, num_candidates=4),
        blend_with_detection=1.0,  # full reset to detection
        smoothing=0.0,
    )
    state = tracker.init({k: v + 100.0 for k, v in params.items()})  # bogus history
    _state1, results = tracker.step(state, frame, detection_params=params)
    # with blend=1 the bogus history must not poison the output
    assert np.abs(np.asarray(results["pred_joints_3d"])).max() < 10.0
