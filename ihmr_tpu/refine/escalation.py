"""Two-pass collision escalation: the reference's 32^3 grid mechanism for
exactly the samples that need it, at the fast engine's price for the rest.

Why: the reference's in-loop collision is a dense per-hand penetration grid
(ref src/models/loss_utils.py:174-193) whose trilinear field gives EVERY
buried vertex an outward gradient, so it resolves deep two-hand interlocks
that nearest-face depths cannot (a buried vertex's nearest face points it
the wrong way, or contributes nothing once it is past the surface skin).
The round-3 paired study (docs/grid_sdf_study.json) measured the gap on the
adversarial interlocked benchmark: final exact collision 0.218 (grid
in-loop) vs 6.63 (shipping nearest-face default) — but the grid costs ~25x
per sample, and on the STANDARD benchmark the two mechanisms agree
(~94-95% decision agreement, collision within noise). The round-4 margin
shell — an attempt to reproduce the outward smear inside the nearest-face
path — was a measured negative result (docs/margin_sweep.json: interlocked
residual collision flat-to-worse across the sweep).

So: don't make one mechanism serve both regimes. ESCALATE.

  pass 1  the full batch refines with the shipping fast engine
          (optimize_batch's normal path; its epilogue already computes the
          per-sample EXACT final collision).
  flag    samples whose final exact collision exceeds
          ``config.escalate_collision``.
  pass 2  ONLY the flagged samples re-refine FROM THEIR INITIAL params with
          the grid in-loop backend (the reference mechanism; fast-build
          knobs ``grid_face_subsample`` / ``grid_num_candidates`` keep the
          voxelization cheap).
  merge   a flagged sample takes its pass-2 result iff that actually
          reduced its exact final collision (keep-best guard: escalation
          can only improve the collision metric, never regress it).

This is host-side orchestration around two jitted engines — no per-sample
branching inside jit, static shapes throughout. The flagged sub-batch is
padded to a power-of-two bucket (>= ``_MIN_BUCKET``) so at most
log2(B) distinct pass-2 program shapes ever compile; a batch with NO
flagged samples never touches the grid program at all, which is what keeps
the standard-benchmark cost identical to the fast engine.

Pass 2 WARM-STARTS from pass-1's fitted params with a half-length schedule
by default (round 5, ``OptConfig.escalate_warm_start=0.5``): the
honest-metric bench measured warm-start strictly better on the standard
family (faster AND lower residual) and neutral on interlocked
(docs/ROUND5.md item 2). Set ``escalate_warm_start=0`` to restart pass 2
from the INITIAL params instead — that reproduces what the reference
itself would have produced for the flagged sample (the grid mechanism
driving the whole stage schedule) rather than a hybrid trajectory; the
running-best select/filter machinery inside the engine guards every stage
against regressions vs its init either way.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import numpy as np

from ihmr_tpu.mano.layer import ManoModel
from ihmr_tpu.refine.schedule import Stage

_MIN_BUCKET = 8


def _bucket_size(n: int, batch: int) -> int:
    b = _MIN_BUCKET
    while b < n:
        b *= 2
    return min(b, batch)


def grid_config(config):
    """The pass-2 engine config: same schedule semantics, grid in-loop.

    ``reselect_every_blocks`` is pinned to 1 here: stale grid fields are a
    measured NEGATIVE for the escalation pass (docs/ROUND5.md esc_k4 —
    staler grids resolve interlocks worse), unlike the nearest-face
    payloads where kre=2 is the quality-gated shipping default. With
    ``escalate_fast_build`` (default) the measured round-5 build profile
    (K=1, stride-2 surface, focused res-24 lattice) replaces the grid_*
    knobs for this pass only."""
    cfg = config.replace(
        loop_collision_fast=False,
        collision_backend="grid",
        loop_collision_subsample=1,
        loop_collision_face_subsample=1,
        loop_collision_alternate=False,
        escalate_collision=0.0,
        escalate_warm_start=0.0,
        reselect_every_blocks=1,
    )
    if config.escalate_fast_build:
        cfg = cfg.replace(
            grid_num_candidates=1,
            grid_face_subsample=2,
            grid_focus=True,
            grid_res=24,
        )
    return cfg


def warm_strategy(strategy: Tuple[Stage, ...], frac: float) -> Tuple[Stage, ...]:
    """The shortened pass-2 schedule for warm starts: every stage's step
    count scaled by ``frac`` (floor 1 epoch — a stage never vanishes, so the
    running-best filter/select guard still runs per stage)."""
    import dataclasses

    return tuple(
        dataclasses.replace(s, epoch=max(1, int(round(s.epoch * frac))))
        for s in strategy
    )


def optimize_batch_escalated(
    model: ManoModel,
    params_init: Dict,
    batch,
    strategy: Tuple[Stage, ...],
    config,
) -> Tuple[Dict, Dict]:
    """optimize_batch with grid escalation (``config.escalate_collision``>0).

    Returns the same (params, results) contract as optimize_batch, plus
    ``results['escalated']`` — a (B,) int32 mask of samples whose shipped
    result came from the grid pass. Per-sample result entries are merged;
    scalar aggregates (e.g. ``total_loss``) remain pass-1's values."""
    from ihmr_tpu.refine.opt_engine import optimize_batch

    base_cfg = config.replace(escalate_collision=0.0)
    params1, results1 = optimize_batch(model, params_init, batch, strategy, base_cfg)

    coll1 = np.asarray(results1["collision_loss"])  # (B,) exact final collision
    bsz = coll1.shape[0]
    flagged = np.where(coll1 > config.escalate_collision)[0]
    escalated = np.zeros(bsz, np.int32)
    if flagged.size == 0:
        results1["escalated"] = escalated
        return params1, results1

    # worst-first so a (never-expected) overflow past the batch keeps the
    # deepest interlocks
    flagged = flagged[np.argsort(-coll1[flagged])]
    k = int(flagged.size)
    bucket = _bucket_size(k, bsz)
    idx = np.concatenate([flagged, np.full(max(0, bucket - k), flagged[0], np.int64)])
    idx = idx[:bucket]

    take = lambda t: jax.tree_util.tree_map(lambda x: x[idx], t)
    # warm start (config.escalate_warm_start > 0): pass 2 polishes pass-1's
    # fitted params with a fraction-length grid schedule instead of
    # re-running the whole schedule from the initial params
    warm = float(config.escalate_warm_start)
    init2 = take(params1) if warm > 0.0 else take(params_init)
    strategy2 = warm_strategy(strategy, warm) if warm > 0.0 else strategy
    params2, results2 = optimize_batch(
        model, init2, take(batch), strategy2, grid_config(config)
    )

    coll2 = np.asarray(results2["collision_loss"])[:k]
    better = coll2 < coll1[flagged[:k]]
    win = flagged[:k][better]
    escalated[win] = 1

    rows = np.nonzero(better)[0]
    merged_params = {
        key: np.asarray(arr).copy() for key, arr in params1.items()
    }
    for key in merged_params:
        merged_params[key][win] = np.asarray(params2[key])[rows]
    merged_results = {}
    for key, arr in results1.items():
        a = np.asarray(arr)
        if a.ndim >= 1 and a.shape[0] == bsz and key in results2:
            a = a.copy()
            a[win] = np.asarray(results2[key])[rows]
        merged_results[key] = a
    merged_results["escalated"] = escalated
    return {key: jax.numpy.asarray(v) for key, v in merged_params.items()}, merged_results
