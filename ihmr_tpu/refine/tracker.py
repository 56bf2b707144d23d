"""Streaming two-hand mesh tracking (temporally batched).

A NEW capability of the rebuild (BASELINE.json configs: "Streaming video:
temporally batched two-hand mesh tracking at real-time rates") — the
reference operates strictly per-image. The tracker exploits temporal
coherence: each frame's refinement is warm-started from the previous frame's
refined parameters, so a much shorter stage schedule reaches the same
quality, and S independent streams are batched into one device program
(leading batch dim = streams), making per-stream cost amortize on the MXU.

Usage:
    tracker = TwoHandTracker(model, num_streams=S)
    state = tracker.init(first_frame_inits)         # from the encoder
    for frame_batch in video:                        # OptBatch per frame
        state, results = tracker.step(state, frame_batch)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from ihmr_tpu.mano.model import ManoModel
from ihmr_tpu.refine.opt_engine import (
    OptBatch,
    OptConfig,
    ParamDict,
    optimize_batch,
)
from ihmr_tpu.refine.schedule import Stage, opt_default


def streaming_strategy(steps_per_stage: int = 30) -> Tuple[Stage, ...]:
    """A short warm-start schedule: same stage structure/filters as
    opt_default but ~10x fewer steps — sufficient when initialized from the
    previous frame instead of a cold per-image prediction."""
    return tuple(dataclasses.replace(s, epoch=steps_per_stage) for s in opt_default)


@flax.struct.dataclass
class TrackerState:
    params: Dict[str, jnp.ndarray]  # previous frame's refined params (S, ...)
    ema_params: Dict[str, jnp.ndarray]  # exponential moving average for output
    frame_idx: jnp.ndarray  # scalar int


class TwoHandTracker:
    def __init__(
        self,
        model: ManoModel,
        strategy: Optional[Sequence[Stage]] = None,
        config: OptConfig = OptConfig(save_mid_freq=5),
        smoothing: float = 0.5,
        blend_with_detection: float = 0.25,
    ):
        """smoothing: EMA factor on the OUTPUT stream (0 = raw per-frame).
        blend_with_detection: weight of the current frame's fresh encoder
        prediction mixed into the warm start (guards against drift)."""
        self.model = model
        self.strategy = tuple(strategy) if strategy is not None else streaming_strategy()
        self.config = config
        self.smoothing = float(smoothing)
        self.blend = float(blend_with_detection)

    def init(self, init_params: ParamDict) -> TrackerState:
        return TrackerState(
            params=init_params,
            ema_params=init_params,
            frame_idx=jnp.asarray(0, jnp.int32),
        )

    def step(
        self,
        state: TrackerState,
        frame: OptBatch,
        detection_params: Optional[ParamDict] = None,
    ) -> Tuple[TrackerState, Dict[str, jnp.ndarray]]:
        """Refine one frame for all streams; returns (state, results)."""
        warm = state.params
        if detection_params is not None and self.blend > 0:
            b = self.blend
            warm = {
                k: (1.0 - b) * warm[k] + b * detection_params[k] for k in warm
            }
        refined, results = optimize_batch(
            self.model, warm, frame, self.strategy, self.config
        )
        a = self.smoothing
        ema = {k: a * state.ema_params[k] + (1.0 - a) * refined[k] for k in refined}
        new_state = TrackerState(
            params=refined, ema_params=ema, frame_idx=state.frame_idx + 1
        )
        results = dict(results)
        results["smoothed_params"] = ema
        return new_state, results
