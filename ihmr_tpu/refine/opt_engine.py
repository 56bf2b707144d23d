"""IHMR-OPT: per-sample collision-aware test-time optimization as one
jit-compiled program (the rebuild's north-star workload; SURVEY.md §3.3).

Reference semantics (ref src/models/optimize_model.py:390-415 and
src/utils/opt_utils.py:70-153): for each strategy stage, (epoch+1) optimizer
steps on that stage's parameter groups; every ``save_mid_freq`` steps the
current params + filter/select losses are snapshotted; after the stage, for
each SAMPLE independently, the best snapshot is chosen — valid snapshots must
keep every filter loss under origin*(1 + (pct+0.1)/100), and among valid ones
the earliest minimum of the select loss wins (snapshot 0 always participates
with its original losses).

TPU-first redesign: the reference's Python loop over 301 torch steps plus a
post-hoc snapshot gather/filter/argmin becomes a single ``lax.scan`` whose
carry holds a RUNNING per-sample best (params, select-loss) — mathematically
identical to the snapshot-buffer argmin with first-minimum tie-breaking (a
strict '<' update preserves the earliest minimum), with O(1) memory instead of
O(num_snapshots). Each stage is compiled once (stage config is static); all
samples in the batch optimize in parallel as a leading batch dimension, so one
chip refines hundreds of images concurrently and a data mesh shards the batch
across chips with zero cross-chip communication (IHMR-OPT is embarrassingly
parallel; ref §2.7).

Adam note: the reference optimizes the batch-MEAN loss; Adam's m/sqrt(v)
update is invariant to that uniform 1/B gradient scale (up to eps), so
per-sample trajectories match the reference's regardless of batch size.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ihmr_tpu.core.projection import orthographic_project
from ihmr_tpu.losses import losses as L
from ihmr_tpu.mano.layer import (
    HandParams,
    two_hand_decode_from_identity,
    two_hand_decode_from_pose_payload,
    two_hand_decode_from_shape_affine,
    two_hand_decode_mirrored,
    two_hand_identity_orient_payload,
    two_hand_pose_payload,
    two_hand_shape_affine_payload,
)
from ihmr_tpu.mano.model import ManoModel
from ihmr_tpu.ops.collision import (
    collision_loss,
    depths_to_loss,
    pair_aabb_scale,
    pair_depths_at,
    pair_depths_at_tris,
    pair_indices,
    pair_select_tris,
    pair_tris_at,
)
from ihmr_tpu.refine.schedule import OPT_DEFAULT_LOSS_WEIGHTS, Stage


@flax.struct.dataclass
class OptBatch:
    """Per-batch inputs of the OPT workload (ref optimize_model.py:120-168)."""

    hand_type_array: jnp.ndarray  # (B, 2)
    hand_type_valid: jnp.ndarray  # (B, 1)
    joints_2d: jnp.ndarray  # (B, 42, 3) gt, [-1,1] coords + validity
    joints_3d: jnp.ndarray  # (B, 42, 4) gt + validity
    gt_pose_params: jnp.ndarray  # (B, 96)
    gt_shape_params: jnp.ndarray  # (B, 20)
    mano_params_weight: jnp.ndarray  # (B, 2)
    hand_trans: jnp.ndarray  # (B, 1, 4) gt trans + validity
    init_joints_2d: jnp.ndarray  # (B, 42, 3) predicted joints (self-consistency targets)
    init_joints_3d: jnp.ndarray  # (B, 42, 4)
    init_hand_trans_j: jnp.ndarray  # (B, 1, 4) trans from predicted joints


@flax.struct.dataclass
class OptConfig:
    optimizer: str = flax.struct.field(pytree_node=False, default="adam")
    save_mid_freq: int = flax.struct.field(pytree_node=False, default=10)
    num_candidates: int = flax.struct.field(pytree_node=False, default=8)
    robustifier: Optional[float] = flax.struct.field(pytree_node=False, default=None)
    collision_backend: str = flax.struct.field(pytree_node=False, default="auto")
    # In-LOOP collision uses the cheap single-candidate XLA path by default:
    # the reference's in-loop SDF is itself a coarse 32^3 voxel grid, so a
    # fast approximate penetration during optimization steps is MORE faithful
    # to its accuracy profile than the exact kernel, which is reserved for
    # the final metrics pass (~2x end-to-end throughput).
    loop_collision_fast: bool = flax.struct.field(pytree_node=False, default=True)
    # evaluate the in-loop collision on every k-th QUERY vertex only (loss
    # rescaled to keep magnitude; the mesh side always stays full — passing
    # a strided array as the mesh was a real round-1 bug whose out-of-bounds
    # face gathers silently clamped under jit into degenerate triangles).
    # DEFAULT 2: with the mesh-side bug FIXED, a 16-seed paired study on the
    # adversarial interlocked deep-contact benchmark measures stride 2 as
    # statistically identical to every-vertex sampling (-0.17 +/- 0.55
    # paired final-exact collision; docs/quality_study.json). Before the fix
    # the same study showed +2.0 +/- 1.1 — the interlocked benchmark is what
    # exposed the bug. Set 1 for strict every-vertex sampling.
    loop_collision_subsample: int = flax.struct.field(pytree_node=False, default=2)
    # evaluate the in-loop collision against every k-th FACE of the target
    # mesh (Morton-sorted at load, so a strided subset is a spatially
    # uniform sub-mesh over the FULL vertex array — always valid). DEFAULT 2,
    # verified by the same paired study.
    loop_collision_face_subsample: int = flax.struct.field(pytree_node=False, default=2)
    # in-loop nearest-face search: 0 = flat (V, F) nearest-centroid ranking
    # (DEFAULT); g > 0 = two-level hierarchy over groups of g Morton-adjacent
    # faces (ops.collision.penetration_depth_2level). The hierarchy does ~7x
    # less rank arithmetic but was MEASURED 3x SLOWER end-to-end on v5e
    # (105 -> 33 hands/sec): its per-query cluster-member gathers lower to
    # row-gather fusions, the same pathology round 1 found with
    # take_along_axis — kept only as a documented negative result / CPU
    # experiment knob. The flat rank is the TPU-correct shape (bf16 stream +
    # fused argmin); its cost is VPU-bound and scales with V*F, so the
    # supported fast knobs are the vertex/face subsample factors above.
    loop_collision_cluster: int = flax.struct.field(pytree_node=False, default=0)
    # Alternate the vertex-subset OFFSET each step when subsampling
    # (loop_collision_subsample == 2 only): even-indexed vertices on even
    # steps, odd on odd steps, so EVERY vertex exerts collision pressure
    # every other step at stride-2 cost — full effective coverage without
    # the deep-contact blind spots of a fixed stride (the failure mode that
    # rejected fixed sub=2, see loop_collision_subsample above). Snapshots
    # land on even steps (save_mid_freq is even in practice), so
    # filter/select comparisons always score the same (even) subset.
    # Quality gate: scripts/quality_study.py 16-seed paired vs strict.
    loop_collision_alternate: bool = flax.struct.field(pytree_node=False, default=False)
    # Fused-engine option (DEFAULT ON; honored only with the fast XLA
    # in-loop backend — loop_collision_fast=True and cluster==0; exact or
    # 2-level in-loop backends reselect every step, see lazy_active()):
    # recompute the per-vertex
    # nearest-face SELECTION once per snapshot period (save_mid_freq steps)
    # instead of every step, while the selected faces' positions still track
    # the current mesh every step. The (V, F) rank+argmin is ~60% of the
    # fused step (trace_step.py) and runs at 63% of the measured VPU ceiling
    # (roofline.py), so amortizing it is the big lever: 39.7 -> 65.6
    # hands/sec at full sampling on v5e batch 128. The selection is a
    # discrete, gradient-free decision that changes slowly across Adam steps
    # (verts move ~mm/step); staleness is bounded by one snapshot period,
    # and every SNAPSHOT's filter/select losses use a fresh selection.
    # Verified quality-free: 16-seed paired studies on the interlocked
    # deep-contact benchmark, (1,1,lazy) vs strict = -0.11 +/- 0.49 and
    # (2,2,lazy) vs (1,1,lazy) = -0.17 +/- 0.55 (GT-joint error identical).
    # Only the fused engine honors this; the per-stage fallback engine
    # always reselects every step.
    loop_collision_lazy_reselect: bool = flax.struct.field(pytree_node=False, default=True)

    # Fused-engine option (DEFAULT ON since round 3): with lazy reselection
    # on, ALSO freeze the selected triangles' vertex POSITIONS for the
    # snapshot block (not just the discrete selection). The per-step triangle
    # build — the mesh_verts[faces] + row-gather pair that tracing showed as
    # the dominant per-step fusions (~0.31 ms/step both directions at B=128;
    # docs/PERFORMANCE.md) — then hoists to the block boundary and the step
    # touches NO gathers at all: MEASURED 129.0 -> 276.6 hands/sec end-to-end
    # on v5e batch 128 (2.14x). Semantics: the mesh side is stop_gradient'd
    # in EVERY in-loop variant, so gradients are identical in structure; the
    # depth magnitude lags the other hand's motion by at most one snapshot
    # period, and every block starts ON a snapshot step, so all filter/select
    # comparisons use fully fresh positions — the same staleness contract as
    # lazy reselection. Quality gate (round-4 32-seed PAIRED study with the
    # frozen scale included, docs/quality_study.json): the shipping default
    # (stride-2 + lazy + freeze) is within noise of strict on EVERY cell —
    # standard B=128 +0.007+/-0.016, interlocked B=64 +0.24+/-0.56,
    # interlocked B=128 +0.34+/-0.34 paired final-exact collision (the
    # round-3 borderline +0.60+/-0.65 cell tightened and passes; notably the
    # NON-frozen stride-2 config is the one flagged worse on that cell,
    # +0.45+/-0.43); GT-joint error flat or better everywhere.
    # Exactness: at save_mid_freq=1 this path is bit-equivalent to per-step
    # positions (tests/test_opt_engine.py::TestFrozenPositions).
    # The AABB NORMALIZATION SCALE freezes with the positions (same contract:
    # gradient-free always — the live AABB is stop_gradient'd — fresh at
    # every snapshot, bit-equivalent at save_mid_freq=1): it was the step's
    # only full-vertex reduce, and with it hoisted XLA slices the per-step
    # decode down to the strided collision-query rows.
    loop_collision_freeze_positions: bool = flax.struct.field(
        pytree_node=False, default=True
    )

    # Rebuild the per-block collision payload every k SNAPSHOT BLOCKS
    # instead of every block (round 5; VERDICT r4 items 2b/3a). Applies to
    # every block-frozen payload kind — nearest-face selections, frozen
    # triangle positions + AABB scale, AND the escalation pass's grid
    # fields — so one knob amortizes both the hoisted engine's ~90-190
    # us/step payload-rebuild floor and the grid escalation's per-block
    # voxelization cost. Snapshot bookkeeping (filter/select running-best)
    # still runs at EVERY block head; only payload freshness coarsens: the
    # selection/positions/grid a snapshot's losses see may be up to k-1
    # blocks stale (the k=1 contract guaranteed fresh-at-snapshot).
    # Staleness argument: vertex motion is ~mm per Adam step and both the
    # nearest-face selection (discrete, slow-moving) and the grid field
    # (~5 mm voxels) change on scales far above k*save_mid_freq steps of
    # drift. Default 2 (round 5): +4.5% headline (426.6 -> 446.0 hands/sec
    # at B=128) and OK on every cell of the 16-seed 4-family paired study
    # (standard/interlocked/grazing/single x B=64/128,
    # docs/quality_study.json). 1 = the round-4 behavior (rebuild every
    # block); NOTE under escalation the staler pass-1/grids are a measured
    # NEGATIVE (docs/ROUND5.md) — escalation.py pins kre=1 for pass 2.
    reselect_every_blocks: int = flax.struct.field(pytree_node=False, default=2)

    # In-loop SHELL margin in mesh units (round 4, from the interlock
    # diagnosis — docs/interlock_diag.json): nearest-face depths become
    # max(0, margin - signed_dist), i.e. near-contact vertices within
    # ``margin`` OUTSIDE the mesh also feel outward pressure, reproducing the
    # trilinear outward smear of the reference's 32^3 grid field (~1 cell,
    # 5-10 mm at hand scale). The diagnosis showed that smear — not depth
    # accuracy — is why the grid mechanism resolves deep interlocks 14x
    # better than even near-exact nearest-face depths. Applies to the IN-LOOP
    # gradient/filter losses only; final metrics always measure true
    # penetration. Value selection: scripts/interlock_diag2.py margin sweep.
    loop_collision_margin: float = flax.struct.field(pytree_node=False, default=0.0)

    # Two-pass grid ESCALATION threshold (round 4; refine/escalation.py):
    # > 0 re-refines any sample whose final EXACT collision exceeds this
    # value with the reference-mechanism grid in-loop backend and keeps the
    # grid result iff it reduced that sample's exact collision. 0 = off.
    # The fast engine's price for clean batches, the reference's deep-
    # interlock behavior for the samples that need it. Threshold units are
    # final exact collision-loss units (docs/grid_sdf_study.json: standard-
    # benchmark residuals are ~0.0x, unresolved interlocks are >> 1).
    escalate_collision: float = flax.struct.field(pytree_node=False, default=0.0)

    # Escalation pass-2 WARM START (round 5; VERDICT r4 item 2c): > 0 runs
    # the grid pass from pass-1's OUTPUT params (not the initial params)
    # with every stage's step count scaled by this fraction (0.5 = half
    # schedule). Rationale: pass 1 already solved the GT-fitting problem;
    # what the flagged samples lack is ONLY the grid field's outward
    # pressure on buried vertices, so a shortened grid polish from the
    # fitted pose can buy most of the quality at a fraction of the pass-2
    # cost. The keep-best merge guard still applies (a warm pass-2 result
    # ships only if it reduced that sample's exact collision). Default 0.5
    # (round 5): the honest-metric bench measured warm-start strictly
    # better on the standard family (38.0 vs 25.5 hands/sec AND residual
    # 0.279 vs 0.333) and neutral on interlocked (docs/ROUND5.md item 2).
    # 0 = the round-4 from-init restart (reference-faithful trajectory).
    escalate_warm_start: float = flax.struct.field(pytree_node=False, default=0.5)

    # Escalation pass-2 FAST BUILD (round 5): True applies the measured
    # grid-build profile to pass 2 — grid_num_candidates=1 (the K-gather
    # epilogue was ~90% of the build cost), grid_face_subsample=2,
    # grid_focus=True with grid_res=24 (the focused intersection-box
    # lattice lands finer-than-reference cells at res 24;
    # docs/escalation_study.json + ROUND5.md) — regardless of the grid_*
    # knobs, which continue to control the `--loop_collision_backend grid`
    # in-loop path. False = pass 2 builds with the user's grid_* knobs
    # (reference-faithful full build by default).
    escalate_fast_build: bool = flax.struct.field(pytree_node=False, default=True)

    # Grid-build fast knobs (escalation pass / grid_in_loop backend):
    # voxelize against every k-th Morton-sorted face (spatially uniform
    # sub-mesh; 1 = full mesh like the reference) and/or with a custom
    # top-k candidate count (0 = num_candidates). The grid is a ~cell-size
    # smoothing mechanism, so a coarser surface mostly re-labels which face
    # wins inside a cell; quality gated by scripts/grid_fast_study.py.
    grid_face_subsample: int = flax.struct.field(pytree_node=False, default=1)
    grid_num_candidates: int = flax.struct.field(pytree_node=False, default=0)

    # Round-4 grid fast-build knobs (measured at B=32 on v5e): the build's
    # cost is its K-candidate take_along epilogue, not the rank matmul —
    # K=8 ~405 ms/block vs K=1 ~51 ms (grid_num_candidates=1 keeps the
    # exact refinement on the argmin face). grid_focus=True voxelizes the
    # padded INTERSECTION of the two hands' AABBs instead of the whole hand
    # (ops/grid_sdf.py::_focus_box): phi is only sampled at the other
    # hand's vertices, so the same grid_res lands finer cells exactly where
    # the field is read. grid_res trades lattice size for cell size
    # (res^3 points per hand per block).
    grid_res: int = flax.struct.field(pytree_node=False, default=32)
    grid_focus: bool = flax.struct.field(pytree_node=False, default=False)

    # Ray-parity inside test on the EXACT metrics pass (round 5, default
    # ON): the epilogue's final collision metric ANDs its depths with a
    # ray-crossing parity classification (ops/collision.py::
    # ray_parity_inside) because every local nearest-face sign test reads
    # phantom ~0.1-deep penetrations on self-intersecting poses (strongly
    # curled fingers pinch the surface; the round-5 grazing benchmark
    # exposed 197/778 phantom vertices on a clean separated pair). In-loop
    # losses are untouched — this is metric correctness, not dynamics; it
    # also stops the escalation pass flagging phantom samples.
    exact_parity_filter: bool = flax.struct.field(pytree_node=False, default=True)

    def lazy_active(self) -> bool:
        """Whether the fused engine may freeze nearest-face selections.

        The frozen-selection path IS the fast nearest-centroid approximation;
        a user selecting an exact in-loop backend (loop_collision_fast=False)
        or the 2-level experiment (cluster>0) must not be silently downgraded
        to it (advisor finding, round 2)."""
        return (
            self.loop_collision_lazy_reselect
            and self.loop_collision_fast
            and self.loop_collision_cluster == 0
        )

    def grid_in_loop(self) -> bool:
        """In-loop collision via the reference-mechanism 32^3 grid backend
        (ops.grid_sdf): selected with loop_collision_fast=False +
        collision_backend='grid'. The fused engine rebuilds the grids once
        per snapshot block (grid staleness <= one block, fresh at every
        snapshot — voxel discretization ~bbox/32 dwarfs the ~mm/step vertex
        motion) and trilinearly samples live queries per step."""
        return (not self.loop_collision_fast) and self.collision_backend == "grid"

    # Engine option (DEFAULT ON since round 3): python-unroll the stage loop
    # (static per-stage masks/lr/weights instead of one scanned stage body)
    # and, for stages whose FROZEN parameter groups allow it, hoist the MANO
    # decode out of the optimizer-step scan entirely — MATHEMATICALLY EXACT
    # partial evaluation, not an approximation:
    #   * trans/cam-only stages (opt_default stage 1; the opt_with_cam cam
    #     stage): orient/pose/shape frozen => both meshes are rigid; trans
    #     enters the mirrored decode purely additively on the left hand
    #     (layer.py::_mirror_and_anchor), so the step touches no decode at
    #     all — verts/joints are payload constants plus trans.
    #   * orient stages (opt_default stage 2): pose/shape frozen => the
    #     decode at identity orient is constant and verts(R0) = R0 @
    #     (verts_id - root) + root exactly (two_hand_identity_orient_payload
    #     proof) — the step replaces the full decode fwd+bwd with one
    #     3x3-rotation apply.
    #   * shape stages (opt_default stage 4): pose/orient frozen => the
    #     decode is exactly AFFINE in the 20 betas
    #     (two_hand_shape_affine_payload proof) — hoist base + 20
    #     directional columns; the step is one basis contraction.
    #   * pose stages: no exact hoist (rotations are nonlinear in pose);
    #     the generic decode runs.
    # The trade: one compiled program per stage instead of one shared scanned
    # body (more compile time, mitigated by the persistent compilation
    # cache). Equivalence vs the scan engine is asserted by
    # tests/test_opt_engine.py::TestStageHoist.
    stage_hoist_decode: bool = flax.struct.field(pytree_node=False, default=True)


ParamDict = Dict[str, jnp.ndarray]


def params_from_init(
    init_cam: jnp.ndarray,  # (B, 3)
    init_pose_params: jnp.ndarray,  # (B, 96)
    init_shape_params: jnp.ndarray,  # (B, 20)
    init_hand_trans: jnp.ndarray,  # (B, 1, 4) or (B, 3)
) -> ParamDict:
    """Split the flat initial prediction into leaf groups
    (ref optimize_model.py:235-251)."""
    trans = init_hand_trans.reshape(init_hand_trans.shape[0], -1)[:, :3]
    return {
        "cam": init_cam,
        "right_orient": init_pose_params[:, 0:3],
        "right_pose": init_pose_params[:, 3:48],
        "left_orient": init_pose_params[:, 48:51],
        "left_pose": init_pose_params[:, 51:96],
        "right_shape": init_shape_params[:, :10],
        "left_shape": init_shape_params[:, 10:],
        "trans": trans,
    }


def params_to_handparams(p: ParamDict) -> HandParams:
    return HandParams(
        cam=p["cam"],
        right_orient=p["right_orient"],
        left_orient=p["left_orient"],
        right_pose=p["right_pose"],
        left_pose=p["left_pose"],
        right_shape=p["right_shape"],
        left_shape=p["left_shape"],
        trans=p["trans"],
    )


def forward(model: ManoModel, p: ParamDict, hands_mean: Optional[jnp.ndarray] = None):
    """params -> (right_verts, left_verts, joints3d (B,42,3), joints2d (B,42,2))."""
    rv, lv, joints = two_hand_decode_mirrored(
        model,
        p["right_orient"],
        p["left_orient"],
        p["right_pose"],
        p["left_pose"],
        p["right_shape"],
        p["left_shape"],
        p["trans"],
        hands_mean,
    )
    j2d = orthographic_project(joints, p["cam"])
    return rv, lv, joints, j2d


def compute_losses(
    model: ManoModel,
    p: ParamDict,
    batch: OptBatch,
    weights: Dict[str, float],
    config: OptConfig,
    in_loop: bool = False,
    coll_idx: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    coll_parity: Optional[jnp.ndarray] = None,
    coll_tris: Optional[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]] = None,
    coll_grid=None,
    fwd_fn=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """All OPT losses (ref optimize_model.py:276-330).

    Returns (total scalar loss, aux dict). aux carries the per-sample vectors
    used by snapshot filtering/selection ('joints_2d_loss_p', and weighted
    'joints_3d_loss_p' batches; 'collision_loss' batch is unweighted exactly
    like the reference) plus scalar logging losses.

    ``fwd_fn`` (params -> (rv, lv, joints3d, joints2d)) substitutes a
    stage-specialized exact forward (OptConfig.stage_hoist_decode); default
    is the full decode.

    ``coll_tris`` is the block-frozen collision payload
    (tri_r, tri_l, frozen_scale): the selected triangles' positions for both
    directions plus the AABB normalization scale frozen with them
    (OptConfig.loop_collision_freeze_positions).
    """
    rv, lv, joints3d, joints2d = (
        fwd_fn(p) if fwd_fn is not None else forward(model, p)
    )
    faces_l = model.faces[:, ::-1]  # mirrored-left winding

    aux: Dict[str, jnp.ndarray] = {}

    # gt-based logging losses
    j2d_gt, _ = L.joints_2d_loss(batch.joints_2d[:, :, :2], joints2d, batch.joints_2d[:, :, 2:3])
    aux["joints_2d_loss"] = j2d_gt
    j3d_gt, _ = L.joints_3d_loss(batch.joints_3d[:, :, :3], joints3d, batch.joints_3d[:, :, 3:4])
    aux["joints_3d_loss"] = j3d_gt * 1000.0
    trans_gt = L.hand_trans_loss(batch.hand_trans[:, :, :3], p["trans"], batch.hand_trans[:, :, 3:4])
    aux["hand_trans_loss"] = trans_gt * 10.0

    # prediction-consistency losses (drive the optimization)
    j2d_p, j2d_p_batch = L.joints_2d_loss(
        batch.init_joints_2d[:, :, :2], joints2d, batch.init_joints_2d[:, :, 2:3]
    )
    j2d_p = j2d_p * weights["joints_2d_loss"]
    aux["joints_2d_loss_p_batch"] = j2d_p_batch * weights["joints_2d_loss"]
    total = j2d_p

    j3d_p, j3d_p_batch = L.joints_3d_loss(
        batch.init_joints_3d[:, :, :3], joints3d, batch.init_joints_3d[:, :, 3:4]
    )
    j3d_p = j3d_p * weights["joints_3d_loss"]
    aux["joints_3d_loss_p_batch"] = j3d_p_batch * weights["joints_3d_loss"]
    total = total + j3d_p

    trans_p = L.hand_trans_loss(
        batch.init_hand_trans_j[:, :, :3], p["trans"], batch.init_hand_trans_j[:, :, 3:4]
    )
    total = total + trans_p * weights["trans_loss_weight"]

    if in_loop and config.loop_collision_fast:
        # measured on v5e: the 2-level hierarchical nearest-centroid beats
        # the flat XLA single-candidate path (whose (V, F) rank materialize +
        # argmin re-read dominated the step trace), which itself beat the
        # exact pallas kernel (32 ms) and a streaming nearest-centroid pallas
        # kernel (12.7 ms — vmapped small-kernel overhead)
        if config.loop_collision_cluster > 0:
            backend, num_candidates = "2level", 1
        else:
            backend, num_candidates = "xla", 1
    else:
        backend, num_candidates = config.collision_backend, config.num_candidates
        if not in_loop and backend == "grid":
            # The grid field is an IN-LOOP mechanism; FINAL metrics always
            # measure true penetration with the exact backend (the contract
            # stated at OptConfig.loop_collision_margin). Round-5 fix: the
            # epilogue previously inherited backend='grid' here, so a
            # grid-config run reported grid-SAMPLED final collision — and
            # escalation's keep-best merge compared pass-2 grid-metric
            # values against pass-1 exact-metric values (caught by
            # TestEscalation: identical params, different 'exact' metric).
            backend, num_candidates = "auto", 8
    sub = config.loop_collision_subsample if in_loop else 1
    fsub = config.loop_collision_face_subsample if in_loop else 1
    # faces may be strided (a Morton-uniform sub-mesh over the FULL vertex
    # array — valid); vertex striding applies to the QUERY side only, the
    # mesh stays full (faces index all 778 vertices)
    faces_r_s = model.faces[::fsub] if fsub > 1 else model.faces
    faces_l_s = faces_l[::fsub] if fsub > 1 else faces_l
    # the frozen-selection and parity-alternating paths below ARE the flat
    # fast nearest-centroid approximation; never take them when the user
    # chose a different in-loop backend (advisor finding, round 2)
    fast_in_loop = (
        in_loop and config.loop_collision_fast and config.loop_collision_cluster == 0
    )
    w_coll = weights["collision_loss_weight"]
    if in_loop and isinstance(w_coll, (int, float)) and float(w_coll) == 0.0:
        # weight 0 means collision exerts no gradient and no filter pressure
        # (a weight-0 schedule never filters/selects on collision); the
        # weights are STATIC floats, so skip the kernel entirely instead of
        # computing work that is multiplied by zero. This makes collision-free
        # schedules (and the collision-free reference-oracle/CPU-anchor runs)
        # genuinely collision-free in compute, not just in effect.
        B, V = rv.shape[0], rv.shape[1]
        coll = jnp.zeros((), rv.dtype)
        coll_batch = jnp.zeros((B,), rv.dtype)
        coll_origin = jnp.zeros((B, 2 * V), rv.dtype)
    elif in_loop and coll_grid is not None:
        # block-frozen reference-mechanism grids (OptConfig.grid_in_loop):
        # live queries trilinearly sample the per-hand phi fields
        from ihmr_tpu.ops.grid_sdf import pair_depths_grid

        q_r, q_l = _query_subsets(rv, lv, sub, coll_parity)
        depths = pair_depths_grid(q_r, q_l, coll_grid)
        coll, coll_batch, coll_origin = depths_to_loss(
            depths, rv, lv, batch.hand_type_array, config.robustifier
        )
    elif fast_in_loop and coll_tris is not None:
        # block-frozen triangle POSITIONS (loop_collision_freeze_positions):
        # live queries against triangles pre-built at the block boundary —
        # the per-step path contains zero gathers. The AABB normalization
        # scale is frozen with them (same staleness contract: fresh at every
        # snapshot, gradient-free always) so the step's only full-vertex use
        # disappears and XLA slices the decode to the query rows.
        tri_r, tri_l, frozen_scale = coll_tris
        q_r, q_l = _query_subsets(rv, lv, sub, coll_parity)
        depths = pair_depths_at_tris(
            q_r, q_l, tri_r, tri_l, margin=config.loop_collision_margin
        )
        coll, coll_batch, coll_origin = depths_to_loss(
            depths, rv, lv, batch.hand_type_array, config.robustifier,
            scale=frozen_scale,
        )
    elif fast_in_loop and coll_idx is not None:
        # frozen nearest-face selection (recomputed by the caller once per
        # snapshot period): faces' POSITIONS track the current mesh, only
        # the discrete selection is reused — see
        # OptConfig.loop_collision_lazy_reselect for the quality evidence
        q_r, q_l = _query_subsets(rv, lv, sub, coll_parity)
        depths = pair_depths_at(
            q_r, q_l, rv, lv, faces_r_s, faces_l_s, *coll_idx,
            margin=config.loop_collision_margin,
        )
        coll, coll_batch, coll_origin = depths_to_loss(
            depths, rv, lv, batch.hand_type_array, config.robustifier
        )
    elif fast_in_loop and coll_parity is not None:
        q_r, q_l = _query_subsets(rv, lv, sub, coll_parity)
        idx = pair_indices(q_r, q_l, rv, lv, faces_r_s, faces_l_s)
        depths = pair_depths_at(
            q_r, q_l, rv, lv, faces_r_s, faces_l_s, *idx,
            margin=config.loop_collision_margin,
        )
        coll, coll_batch, coll_origin = depths_to_loss(
            depths, rv, lv, batch.hand_type_array, config.robustifier
        )
    else:
        coll, coll_batch, coll_origin = collision_loss(
            rv,
            lv,
            faces_r_s,
            faces_l_s,
            batch.hand_type_array,
            robustifier=config.robustifier,
            num_candidates=num_candidates,
            backend=backend,
            cluster_group=config.loop_collision_cluster,
            query_subsample=sub,
            margin=config.loop_collision_margin if in_loop else 0.0,
            parity_filter=(not in_loop) and config.exact_parity_filter,
        )
    if sub > 1:  # keep the loss magnitude comparable to full sampling
        coll = coll * sub
        coll_batch = coll_batch * sub
    aux["collision_loss"] = coll * weights["collision_loss_weight"]
    aux["collision_loss_batch"] = coll_batch  # unweighted, like the reference
    aux["collision_loss_origin_scale"] = coll_origin
    total = total + coll * weights["collision_loss_weight"]

    shape_params = jnp.concatenate([p["right_shape"], p["left_shape"]], axis=1)
    shape_reg, _ = L.shape_reg_loss(shape_params)
    total = total + shape_reg * weights["shape_reg_loss_weight"]
    aux["shape_reg_loss"] = shape_reg * weights["shape_reg_loss_weight"]

    finger_reg, _ = L.finger_reg_loss(joints3d)
    total = total + finger_reg * weights["finger_reg_loss_weight"]
    aux["finger_reg_loss"] = finger_reg * weights["finger_reg_loss_weight"]

    return total, aux


def _query_subsets(rv, lv, sub, parity):
    """Collision QUERY subsets: fixed stride, or parity-alternating offset
    (even-indexed vertices on even steps, odd on odd; full coverage every 2
    steps at stride-2 cost). Both slices are cheap; the select is per-step."""
    if sub == 2 and parity is not None:
        even = parity == 0
        return (
            jnp.where(even, rv[:, 0::2], rv[:, 1::2]),
            jnp.where(even, lv[:, 0::2], lv[:, 1::2]),
        )
    if sub > 1:
        return rv[:, ::sub], lv[:, ::sub]
    return rv, lv


_FILTER_KEYS = {
    "joints_3d_loss_p": "joints_3d_loss_p_batch",
    "joints_2d_loss_p": "joints_2d_loss_p_batch",
    "collision_loss": "collision_loss_batch",
}


def _make_optimizer(stage: Stage, optimizer: str):
    if optimizer == "adam":
        return optax.adam(stage.lr, b1=0.9, b2=0.999, eps=1e-8)
    assert optimizer == "sgd", optimizer
    return optax.sgd(stage.lr, momentum=0.9)


def run_stage(
    model: ManoModel,
    params: ParamDict,
    batch: OptBatch,
    stage: Stage,
    config: OptConfig,
) -> ParamDict:
    """One refinement stage: scan of optimizer steps + running-best selection."""
    weights = stage.weights
    subset = {k: params[k] for k in stage.update_params}
    frozen = {k: v for k, v in params.items() if k not in stage.update_params}

    def loss_fn(sub: ParamDict):
        return compute_losses(model, {**frozen, **sub}, batch, weights, config, in_loop=True)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    tx = _make_optimizer(stage, config.optimizer)

    filter_names = [name for name, _pct in stage.filter_loss]
    bars_pct = {
        name: (float(pct) + 0.1) / 100.0 for name, pct in stage.filter_loss
    }  # ref opt_utils.py:111 (+0.1 smoothing)

    # ---- step 0: establish origin losses, initial best, first update
    (_, aux0), grads0 = grad_fn(subset)
    origin = {name: aux0[_FILTER_KEYS[name]] for name in filter_names}
    bars = {name: origin[name] * (1.0 + bars_pct[name]) for name in filter_names}
    best_select = aux0[_FILTER_KEYS[stage.select_loss]]
    best_subset = subset

    opt_state = tx.init(subset)
    updates, opt_state = tx.update(grads0, opt_state, subset)
    subset = optax.apply_updates(subset, updates)

    bars_stack = jnp.stack([bars[n] for n in filter_names], axis=0)  # (NF, B)

    def step(carry, j):
        subset, opt_state, best_subset, best_select = carry
        (_, aux), grads = grad_fn(subset)

        is_snapshot = (j % config.save_mid_freq) == 0
        cur = jnp.stack([aux[_FILTER_KEYS[n]] for n in filter_names], axis=0)  # (NF, B)
        valid = jnp.all(cur <= bars_stack, axis=0)  # (B,)
        cur_select = aux[_FILTER_KEYS[stage.select_loss]]
        improve = is_snapshot & valid & (cur_select < best_select)  # (B,)

        best_select = jnp.where(improve, cur_select, best_select)
        best_subset = {
            k: jnp.where(improve[:, None], subset[k], best_subset[k]) for k in subset
        }

        updates, opt_state = tx.update(grads, opt_state, subset)
        subset = optax.apply_updates(subset, updates)
        return (subset, opt_state, best_subset, best_select), None

    (subset, _, best_subset, _), _ = jax.lax.scan(
        step,
        (subset, opt_state, best_subset, best_select),
        jnp.arange(1, stage.epoch + 1),
    )
    return {**frozen, **best_subset}


# ---------------------------------------------------------------------------
# Fused whole-pipeline engine: ONE compiled program for all stages.
#
# Observation: the opt_default stages differ only in DATA — which parameter
# groups update (a 0/1 mask), the learning rate, and the loss weights; the
# step count, filter set/percents, select loss and snapshot cadence are
# shared. Masked Adam (grads * mask, fresh m=v=0 per stage) moves frozen
# groups by exactly 0, so a single traced stage body scanned over the stacked
# per-stage constants reproduces the per-stage programs bit-for-bit while
# compiling ONCE instead of len(strategy) times (~4x less XLA compile time —
# the dominant cold-start cost on a tunneled TPU).

_ADAM_B1, _ADAM_B2, _ADAM_EPS = 0.9, 0.999, 1e-8
_SGD_MOMENTUM = 0.9  # ref optimize_model.py:346-347
# A/B switch for the merged-(2B) per-block payload builder — a round-4
# MEASURED NEGATIVE kept for the record: isolated it is ~2x faster than the
# two-call pair (scripts/rebuild_bench.py, 2141 -> ~1040 us at B=128: one
# shared tri build, one merged rank/argmin/selection), but IN-ENGINE it
# lost at every stage (stage_bench: trans 204->238, orient 268->330, pose
# 378->401, shape 267->327 us/step) — XLA already CSEs the duplicate
# mesh[faces] builds inside the jitted payload program, so the merge only
# adds (2B) concat/split copies. Default OFF; IHMR_PAYLOAD_FUSED=1 to
# re-measure.
_PAYLOAD_FUSED = os.environ.get("IHMR_PAYLOAD_FUSED", "0") != "0"


def _tree_zeros(tree):
    return jax.tree_util.tree_map(jnp.zeros_like, tree)


def _strategy_is_fusable(strategy: Tuple[Stage, ...]) -> bool:
    s0 = strategy[0]
    return all(
        s.epoch == s0.epoch
        and s.filter_loss == s0.filter_loss
        and s.select_loss == s0.select_loss
        for s in strategy
    )


def _stack_stage_constants(strategy: Tuple[Stage, ...]):
    """-> (masks {group: (S,)}, lrs (S,), weights {name: (S,)})."""
    from ihmr_tpu.refine.schedule import PARAM_GROUP_DIMS

    masks = {
        g: jnp.asarray([1.0 if g in s.update_params else 0.0 for s in strategy])
        for g in PARAM_GROUP_DIMS
    }
    lrs = jnp.asarray([s.lr for s in strategy], jnp.float32)
    weight_names = sorted(dict(strategy[0].loss_weights))
    weights = {
        name: jnp.asarray([dict(s.loss_weights)[name] for s in strategy], jnp.float32)
        for name in weight_names
    }
    return masks, lrs, weights


def _lazy_coll_payload(
    model: ManoModel, p: ParamDict, config: OptConfig, parities, mode: str,
    fwd_fn=None,
):
    """Per-block collision payload at the CURRENT params, matching
    compute_losses' in-loop query subsetting: one entry per parity in
    ``parities`` (None = fixed-stride subset), sharing a single decode.

    mode='idx': nearest-face selections (idx_r, idx_l) — positions rebuilt
    every step. mode='tris': the selected triangles' POSITIONS (tri_r, tri_l)
    — the step touches no gathers at all
    (OptConfig.loop_collision_freeze_positions). mode='grid': the
    reference-mechanism per-hand phi grids (query-independent — ONE entry
    regardless of parities; OptConfig.grid_in_loop)."""
    rv, lv, _, _ = fwd_fn(p) if fwd_fn is not None else forward(model, p)
    if mode == "grid":
        from ihmr_tpu.ops.grid_sdf import pair_grids

        # grids default to the FULL face set (the reference voxelizes the
        # full mesh); the build-cost knobs are opt-in (OptConfig docstring)
        return (
            pair_grids(
                rv,
                lv,
                model.faces,
                model.faces[:, ::-1],
                res=config.grid_res,
                num_candidates=config.grid_num_candidates or config.num_candidates,
                face_subsample=config.grid_face_subsample,
                focus=config.grid_focus,
            ),
        )
    sub = config.loop_collision_subsample
    fsub = config.loop_collision_face_subsample
    faces_l = model.faces[:, ::-1]
    faces_r_s = model.faces[::fsub] if fsub > 1 else model.faces
    faces_l_s = faces_l[::fsub] if fsub > 1 else faces_l
    if mode == "tris" and _PAYLOAD_FUSED:
        # fused one-pass builder (round 4): single shared tri build + merged
        # (2B) rank/argmin/selection — ~2x cheaper than the pair_indices +
        # pair_tris_at pair (ops/collision.py::pair_select_tris). All
        # parities' query subsets ride ONE call, concatenated on the V axis.
        scale = pair_aabb_scale(rv, lv)
        qs = [_query_subsets(rv, lv, sub, par) for par in parities]
        q_r = jnp.concatenate([q[0] for q in qs], axis=1) if len(qs) > 1 else qs[0][0]
        q_l = jnp.concatenate([q[1] for q in qs], axis=1) if len(qs) > 1 else qs[0][1]
        tri_r, tri_l = pair_select_tris(q_r, q_l, rv, lv, faces_r_s, faces_l_s)
        v = qs[0][0].shape[1]
        return tuple(
            (tri_r[:, i * v : (i + 1) * v], tri_l[:, i * v : (i + 1) * v], scale)
            for i in range(len(qs))
        )
    out = []
    scale = pair_aabb_scale(rv, lv) if mode == "tris" else None
    for par in parities:
        q_r, q_l = _query_subsets(rv, lv, sub, par)
        idx = pair_indices(q_r, q_l, rv, lv, faces_r_s, faces_l_s)
        if mode == "tris":
            tri_r, tri_l = pair_tris_at(rv, lv, faces_r_s, faces_l_s, *idx)
            out.append((tri_r, tri_l, scale))
        else:
            out.append(idx)
    return tuple(out)


def run_all_stages_fused(
    model: ManoModel,
    params: ParamDict,
    batch: OptBatch,
    strategy: Tuple[Stage, ...],
    config: OptConfig,
) -> ParamDict:
    """lax.scan over stages of lax.scan over optimizer steps; single trace.

    With ``config.loop_collision_lazy_reselect`` the step scan is blocked by
    snapshot period: each block recomputes the nearest-face selection once,
    then runs ``save_mid_freq`` steps against it (block starts coincide with
    snapshot steps, so every snapshot's losses use a FRESH selection and the
    filter/select comparisons stay apples-to-apples)."""
    assert _strategy_is_fusable(strategy)
    assert config.optimizer == "adam", "fused path implements adam; use run_stage for sgd"
    s0 = strategy[0]
    masks, lrs, weights = _stack_stage_constants(strategy)
    filter_names = [name for name, _pct in s0.filter_loss]
    bars_pct = jnp.asarray(
        [(float(pct) + 0.1) / 100.0 for _n, pct in s0.filter_loss], jnp.float32
    )
    select_key = _FILTER_KEYS[s0.select_loss]
    B = batch.hand_type_array.shape[0]

    alternate = (
        config.loop_collision_alternate and config.loop_collision_subsample == 2
    )
    # collision weight 0 in EVERY stage: re-staticize the (scanned, traced)
    # weight so compute_losses' static skip removes the kernel from the
    # program (collision-free schedules / reference-oracle runs)
    all_coll_zero = all(
        float(dict(s.loss_weights)["collision_loss_weight"]) == 0.0 for s in strategy
    )

    grid_mode = config.grid_in_loop()
    payload_mode = "grid" if grid_mode else (
        "tris" if config.loop_collision_freeze_positions else "idx"
    )

    def grad_fn(p, w, payload=None, parity=None):
        if all_coll_zero:
            w = dict(w, collision_loss_weight=0.0)
        kw = {"coll_" + payload_mode: payload}
        return jax.value_and_grad(
            lambda q: compute_losses(
                model, q, batch, w, config,
                in_loop=True, coll_parity=parity, **kw,
            ),
            has_aux=True,
        )(p)

    def stage_body(params, stage_const):
        mask, lr, w = stage_const
        m = _tree_zeros(params)
        v = _tree_zeros(params)

        def make_step(payload_set):
            def step(carry, j):
                params, m, v, best, best_select, bars = carry
                parity = (j % 2) if alternate else None
                if payload_set is None:
                    payload = None
                elif alternate and len(payload_set) == 2:
                    # parity-alternating selections (grid payloads are
                    # query-independent: always a single entry)
                    even = (j % 2) == 0
                    payload = jax.tree_util.tree_map(
                        lambda e, o: jnp.where(even, e, o),
                        payload_set[0],
                        payload_set[1],
                    )
                else:
                    payload = payload_set[0]
                (_, aux), grads = grad_fn(params, w, payload, parity)
                grads = {k: grads[k] * mask[k] for k in grads}

                cur = jnp.stack([aux[_FILTER_KEYS[n]] for n in filter_names], 0)  # (NF, B)
                cur_select = aux[select_key]
                is_first = j == 0
                bars = jnp.where(is_first, cur * (1.0 + bars_pct[:, None]), bars)
                is_snapshot = (j % config.save_mid_freq) == 0
                valid = jnp.all(cur <= bars, axis=0)
                improve = is_first | (is_snapshot & valid & (cur_select < best_select))
                best_select = jnp.where(improve, cur_select, best_select)
                best = {k: jnp.where(improve[:, None], params[k], best[k]) for k in params}

                # adam (matches optax.adam/torch defaults incl. bias correction)
                t = (j + 1).astype(jnp.float32)
                m = {k: _ADAM_B1 * m[k] + (1 - _ADAM_B1) * grads[k] for k in m}
                v = {k: _ADAM_B2 * v[k] + (1 - _ADAM_B2) * grads[k] ** 2 for k in v}
                c1 = 1.0 - _ADAM_B1**t
                c2 = 1.0 - _ADAM_B2**t
                params = {
                    k: params[k] - lr * (m[k] / c1) / (jnp.sqrt(v[k] / c2) + _ADAM_EPS)
                    for k in params
                }
                return (params, m, v, best, best_select, bars), None

            return step

        carry = (
            params,
            m,
            v,
            params,
            jnp.full((B,), jnp.inf, jnp.float32),
            jnp.zeros((len(filter_names), B), jnp.float32),
        )
        steps = s0.epoch + 1
        # parities the selection must cover: fixed subset unless alternating
        parities = (jnp.int32(0), jnp.int32(1)) if alternate else (None,)
        blocked = (not all_coll_zero) and (config.lazy_active() or grid_mode)
        if not blocked:
            carry, _ = jax.lax.scan(make_step(None), carry, jnp.arange(steps))
        else:
            freq = config.save_mid_freq
            nblocks, tail = divmod(steps, freq)

            # superblocks of kre blocks share one payload rebuild
            # (OptConfig.reselect_every_blocks; kre=1 == round-4 behavior)
            kre = max(1, config.reselect_every_blocks)

            def superblock(carry, j0, blocks, tail_len=0):
                payload_set = _lazy_coll_payload(
                    model, carry[0], config, parities, payload_mode
                )
                for i in range(blocks):
                    carry, _ = jax.lax.scan(
                        make_step(payload_set),
                        carry,
                        j0 + i * freq + jnp.arange(freq),
                    )
                if tail_len:
                    carry, _ = jax.lax.scan(
                        make_step(payload_set),
                        carry,
                        j0 + blocks * freq + jnp.arange(tail_len),
                    )
                return carry

            nsb, rem = divmod(nblocks, kre)
            if nsb:
                carry, _ = jax.lax.scan(
                    lambda c, s: (superblock(c, s * (kre * freq), kre), None),
                    carry,
                    jnp.arange(nsb),
                )
            if rem or tail:
                carry = superblock(carry, jnp.asarray(nsb * kre * freq), rem, tail)
        return carry[3], None

    stage_consts = (masks, lrs, weights)
    params, _ = jax.lax.scan(stage_body, params, stage_consts)
    return params


def _make_stage_forward(model: ManoModel, stage: Stage, params_entry: ParamDict):
    """Stage-specialized EXACT forward, or None when no hoist applies.

    Partial evaluation of ``forward`` against the stage's frozen parameter
    groups (OptConfig.stage_hoist_decode). ``params_entry`` are the params
    ENTERING the stage; frozen groups provably do not change during the
    stage (their gradients are zero — masked in the fused engine, absent
    from the differentiated subset here — and the Adam moments start at
    zero, so every frozen update is exactly 0)."""
    up = set(stage.update_params)
    pe = params_entry
    if up <= {"trans", "cam"}:
        # every group that shapes either mesh is frozen: decode ONCE at
        # trans=0; trans enters the mirrored two-hand composition purely
        # additively on the left half (layer.py::_mirror_and_anchor), and
        # cam only through the projection
        zero_trans = jnp.zeros_like(pe["trans"])
        rv0, lv0, j0 = two_hand_decode_mirrored(
            model,
            pe["right_orient"],
            pe["left_orient"],
            pe["right_pose"],
            pe["left_pose"],
            pe["right_shape"],
            pe["left_shape"],
            zero_trans,
        )

        def fwd(p):
            t = p["trans"][:, None, :]
            joints = jnp.concatenate([j0[:, :21], j0[:, 21:] + t], axis=1)
            return rv0, lv0 + t, joints, orthographic_project(joints, p["cam"])

        return fwd
    if up <= {"right_orient", "left_orient", "trans", "cam"}:
        # pose/shape frozen: hoist the identity-orient decode; the step
        # applies one rotation about the rest root per hand (exact — see
        # two_hand_identity_orient_payload)
        verts_id, lbsj_id = two_hand_identity_orient_payload(
            model,
            pe["right_pose"],
            pe["left_pose"],
            pe["right_shape"],
            pe["left_shape"],
        )

        def fwd(p):
            rv, lv, joints = two_hand_decode_from_identity(
                verts_id, lbsj_id, p["right_orient"], p["left_orient"], p["trans"]
            )
            return rv, lv, joints, orthographic_project(joints, p["cam"])

        return fwd
    if up <= {"right_shape", "left_shape", "trans", "cam"}:
        # pose/orient frozen: the decode is exactly AFFINE in the 20 shape
        # coefficients (two_hand_shape_affine_payload proof) — hoist the
        # base + 20 directional columns (one 21x-batch decode, once per
        # stage); the step is one (20,B,V,3)x(B,20) contraction fwd+bwd
        base, basis = two_hand_shape_affine_payload(
            model,
            pe["right_orient"],
            pe["left_orient"],
            pe["right_pose"],
            pe["left_pose"],
            pe["right_shape"],
            pe["left_shape"],
        )
        shape_r0, shape_l0 = pe["right_shape"], pe["left_shape"]

        def fwd(p):
            rv, lv, joints = two_hand_decode_from_shape_affine(
                base, basis, shape_r0, shape_l0,
                p["right_shape"], p["left_shape"], p["trans"],
            )
            return rv, lv, joints, orthographic_project(joints, p["cam"])

        return fwd
    if up <= {"right_pose", "left_pose", "trans", "cam"}:
        # orient/shape frozen (opt_default stage 3, finger poses): hoist the
        # betas-only rest-shape parts (v_shaped / j_rest / rel_j) and the
        # root rotation matrix — exact partial evaluation
        # (two_hand_pose_payload); the step keeps only the finger rotations,
        # pose blendshapes, FK and skinning.
        payload = two_hand_pose_payload(
            model,
            pe["right_orient"],
            pe["left_orient"],
            pe["right_shape"],
            pe["left_shape"],
        )

        def fwd(p):
            rv, lv, joints = two_hand_decode_from_pose_payload(
                model, payload, p["right_pose"], p["left_pose"], p["trans"]
            )
            return rv, lv, joints, orthographic_project(joints, p["cam"])

        return fwd
    return None


def run_all_stages_hoisted(
    model: ManoModel,
    params: ParamDict,
    batch: OptBatch,
    strategy: Tuple[Stage, ...],
    config: OptConfig,
) -> ParamDict:
    """Python-unrolled stage loop with per-stage STATIC constants and
    stage-specialized exact forwards (OptConfig.stage_hoist_decode).

    Same semantics as run_all_stages_fused / run_stage (same snapshot
    filter/select, same fresh-moment Adam); the difference is per-step
    decode WORK: in opt_default, stages 1 (trans), 2 (orients) and 4
    (shapes) run with the full MANO decode hoisted out of the step scan —
    the dominant per-step cost (decode fwd+bwd, docs/PERFORMANCE.md) drops
    to an add / one rotation apply / one affine-basis contraction for three
    quarters of the schedule; the pose stage (round 4) hoists the betas-only
    rest-shape parts and the frozen root rotation, keeping only finger
    rotations + pose blendshapes + FK + skinning per step.
    Unlike the scanned engine, per-stage step counts and filter sets may
    differ (opt_with_cam's 100-step cam stage runs here too)."""
    for stage in strategy:
        params = _run_one_stage_hoisted(model, params, batch, stage, config)
    return params


def _run_one_stage_hoisted(
    model: ManoModel,
    params: ParamDict,
    batch: OptBatch,
    stage: Stage,
    config: OptConfig,
) -> ParamDict:
    assert config.optimizer in ("adam", "sgd"), config.optimizer
    w = stage.weights  # static python floats (enables the weight-0 skip)
    filter_names = [name for name, _pct in stage.filter_loss]
    bars_pct = jnp.asarray(
        [(float(pct) + 0.1) / 100.0 for _n, pct in stage.filter_loss], jnp.float32
    )
    select_key = _FILTER_KEYS[stage.select_loss]
    B = batch.hand_type_array.shape[0]

    alternate = (
        config.loop_collision_alternate and config.loop_collision_subsample == 2
    )
    coll_zero = float(w["collision_loss_weight"]) == 0.0
    grid_mode = config.grid_in_loop()
    payload_mode = "grid" if grid_mode else (
        "tris" if config.loop_collision_freeze_positions else "idx"
    )

    fwd_fn = (
        _make_stage_forward(model, stage, params)
        if config.stage_hoist_decode
        else None
    )

    subset = {k: params[k] for k in stage.update_params}
    frozen = {k: v for k, v in params.items() if k not in stage.update_params}

    def grad_fn(sub, payload=None, parity=None):
        kw = {"coll_" + payload_mode: payload}
        return jax.value_and_grad(
            lambda s: compute_losses(
                model, {**frozen, **s}, batch, w, config,
                in_loop=True, coll_parity=parity, fwd_fn=fwd_fn, **kw,
            ),
            has_aux=True,
        )(sub)

    lr = stage.lr
    m = _tree_zeros(subset)
    v = _tree_zeros(subset)

    def pick_payload(payload_set, j):
        if payload_set is None:
            return None
        if alternate and len(payload_set) == 2:
            # parity-alternating selections (grid payloads are
            # query-independent: always a single entry)
            even = (j % 2) == 0
            return jax.tree_util.tree_map(
                lambda e, o: jnp.where(even, e, o),
                payload_set[0],
                payload_set[1],
            )
        return payload_set[0]

    def opt_update(subset, m, v, grads, j):
        if config.optimizer == "sgd":
            # torch SGD, momentum 0.9, dampening 0 (ref optimize_model.py:
            # 346-347): buf = mu*buf + grad (first step buf = grad, matched
            # by the zero init); p -= lr * buf. optax.sgd(momentum=0.9) is
            # the same trace form. v is untouched (carried zeros).
            m = {k: _SGD_MOMENTUM * m[k] + grads[k] for k in m}
            subset = {k: subset[k] - lr * m[k] for k in subset}
            return subset, m, v
        # adam: matches optax.adam/torch defaults incl. bias correction
        t = (j + 1).astype(jnp.float32)
        m = {k: _ADAM_B1 * m[k] + (1 - _ADAM_B1) * grads[k] for k in m}
        v = {k: _ADAM_B2 * v[k] + (1 - _ADAM_B2) * grads[k] ** 2 for k in v}
        c1 = 1.0 - _ADAM_B1**t
        c2 = 1.0 - _ADAM_B2**t
        subset = {
            k: subset[k] - lr * (m[k] / c1) / (jnp.sqrt(v[k] / c2) + _ADAM_EPS)
            for k in subset
        }
        return subset, m, v

    # Snapshot bookkeeping runs ONLY at block boundaries (round 4): blocks
    # are save_mid_freq steps long and start exactly on the snapshot steps
    # (j % save_mid_freq == 0), so the per-step filter-stack / validity /
    # best-params where-updates — pure bookkeeping that the old per-step
    # body evaluated and discarded on 9 of every 10 steps — hoist to the
    # block head. The LEAN steps inside a block compute only grads + Adam;
    # not consuming the aux dict also lets XLA dead-code-eliminate the three
    # GT-logging losses (incl. the root-aligned joints_3d_loss) from the lean
    # step program. Mathematically identical to the per-step formulation:
    # `improve` was `is_snapshot & ...` and is_snapshot is False off the
    # block head.
    def snapshot_and_first_update(carry, j0, payload_set):
        subset, m, v, best, best_select, bars = carry
        parity0 = (j0 % 2) if alternate else None
        (_, aux), grads = grad_fn(subset, pick_payload(payload_set, j0), parity0)
        cur = jnp.stack([aux[_FILTER_KEYS[n]] for n in filter_names], 0)  # (NF, B)
        cur_select = aux[select_key]
        is_first = j0 == 0
        bars = jnp.where(is_first, cur * (1.0 + bars_pct[:, None]), bars)
        valid = jnp.all(cur <= bars, axis=0)
        improve = is_first | (valid & (cur_select < best_select))
        best_select = jnp.where(improve, cur_select, best_select)
        best = {k: jnp.where(improve[:, None], subset[k], best[k]) for k in subset}
        subset, m, v = opt_update(subset, m, v, grads, j0)
        return (subset, m, v, best, best_select, bars)

    def make_lean_step(payload_set):
        def lean_step(carry, j):
            subset, m, v = carry
            parity = (j % 2) if alternate else None
            (_, _aux), grads = grad_fn(subset, pick_payload(payload_set, j), parity)
            subset, m, v = opt_update(subset, m, v, grads, j)
            return (subset, m, v), None

        return lean_step

    carry = (
        subset,
        m,
        v,
        subset,
        jnp.full((B,), jnp.inf, jnp.float32),
        jnp.zeros((len(filter_names), B), jnp.float32),
    )
    steps = stage.epoch + 1
    parities = (jnp.int32(0), jnp.int32(1)) if alternate else (None,)
    blocked = (not coll_zero) and (config.lazy_active() or grid_mode)
    # Unroll the inner STEP scan for HOISTED stages: their per-step ops are
    # tiny (the trans stage's step is ~72 us of device busy at B=128 against
    # ~238 us of wall — ~65% loop-control/scheduling bubbles, trace_stage.py)
    # so unrolling one full snapshot block lets the scheduler pack adjacent
    # steps' small ops: MEASURED at B=128 trans 238->211, orient 331->294,
    # shape 419->284 us/step. The generic-decode pose stage is compute-dense
    # enough that unrolling buys nothing (377->383, slightly worse) — it
    # stays rolled. Env IHMR_SCAN_UNROLL overrides for experiments.
    # NOTE: the override is read at TRACE time; optimize_batch's jit cache
    # key is (strategy, config), so changing the env var mid-process reuses
    # already-compiled programs — it only applies to freshly traced configs.
    unroll_env = os.environ.get("IHMR_SCAN_UNROLL")
    # the pose stage keeps FK + skinning per step even with its round-4
    # rest-shape hoist — compute-dense, so it stays rolled like before
    dense_stage = bool(set(stage.update_params) & {"right_pose", "left_pose"})
    if unroll_env is not None:
        unroll = max(1, int(unroll_env))
    else:
        unroll = (
            min(config.save_mid_freq, 10)
            if (fwd_fn is not None and not dense_stage)
            else 1
        )

    freq = config.save_mid_freq
    nblocks, tail = divmod(steps, freq)

    def payload_at(sub):
        if not blocked:
            # per-step reselection paths (exact/2level in-loop backends) and
            # the static collision-free skip carry no block payload
            return None
        return _lazy_coll_payload(
            model, {**frozen, **sub}, config, parities, payload_mode,
            fwd_fn=fwd_fn,
        )

    def run_block(carry, j0, length, payload_set):
        carry = snapshot_and_first_update(carry, j0, payload_set)
        if length > 1:
            subset, m, v, best, best_select, bars = carry
            (subset, m, v), _ = jax.lax.scan(
                make_lean_step(payload_set),
                (subset, m, v),
                j0 + 1 + jnp.arange(length - 1),
                unroll=min(unroll, length - 1),
            )
            carry = (subset, m, v, best, best_select, bars)
        return carry

    # Payload-rebuild decoupling (OptConfig.reselect_every_blocks): group k
    # snapshot blocks into a SUPERBLOCK sharing one payload rebuild. Only
    # meaningful when a block payload exists at all (`blocked`).
    kre = max(1, config.reselect_every_blocks) if blocked else 1
    if kre == 1:
        if nblocks:
            carry, _ = jax.lax.scan(
                lambda c, b: (run_block(c, b * freq, freq, payload_at(c[0])), None),
                carry,
                jnp.arange(nblocks),
            )
        if tail:
            carry = run_block(
                carry, jnp.asarray(nblocks * freq), tail, payload_at(carry[0])
            )
    else:
        def run_superblock(carry, j0, blocks, tail_len=0):
            payload_set = payload_at(carry[0])
            for i in range(blocks):
                carry = run_block(carry, j0 + i * freq, freq, payload_set)
            if tail_len:
                carry = run_block(carry, j0 + blocks * freq, tail_len, payload_set)
            return carry

        nsb, rem = divmod(nblocks, kre)
        if nsb:
            carry, _ = jax.lax.scan(
                lambda c, s: (run_superblock(c, s * (kre * freq), kre), None),
                carry,
                jnp.arange(nsb),
            )
        if rem or tail:
            carry = run_superblock(carry, jnp.asarray(nsb * kre * freq), rem, tail)
    return {**frozen, **carry[3]}


def optimize_batch(
    model: ManoModel,
    params_init: ParamDict,
    batch: OptBatch,
    strategy: Tuple[Stage, ...],
    config: OptConfig = OptConfig(),
) -> Tuple[ParamDict, Dict[str, jnp.ndarray]]:
    """The full OPT pipeline: all stages, then a final forward with default
    loss weights (ref optimize.py:64-66 + optimize_model.py:412-414).

    Returns (refined params, results dict with verts/joints/losses matching
    ``get_pred_result``; ref optimize_model.py:418-435).

    Engine selection: the python-unrolled HOISTED engine (per-stage static
    constants + stage-specialized exact forwards; the shipping default) when
    config.stage_hoist_decode — adam or sgd; else the fused single-compile
    scan engine when the strategy allows (uniform step counts/filters,
    adam); else per-stage programs. With config.escalate_collision > 0 the
    whole thing runs as pass 1 of the two-pass grid escalation — host-side
    orchestration OUTSIDE the jit boundary (refine/escalation.py): flagged
    high-residual samples re-refine with the reference-mechanism grid
    backend on a padded power-of-two bucket.
    """
    if config.escalate_collision > 0.0:
        from ihmr_tpu.refine.escalation import optimize_batch_escalated

        return optimize_batch_escalated(model, params_init, batch, strategy, config)
    return _optimize_batch_jit(model, params_init, batch, strategy, config)


@partial(jax.jit, static_argnames=("strategy", "config"))
def _optimize_batch_jit(
    model: ManoModel,
    params_init: ParamDict,
    batch: OptBatch,
    strategy: Tuple[Stage, ...],
    config: OptConfig,
) -> Tuple[ParamDict, Dict[str, jnp.ndarray]]:
    params = params_init
    if config.stage_hoist_decode:
        # adam AND sgd (round 4): the hoist math is optimizer-agnostic, so
        # the reference's --optimizer sgd path (momentum 0.9) gets the same
        # stage-specialized engine instead of silently falling back to the
        # slow per-stage programs (VERDICT round-3 weak #4)
        params = run_all_stages_hoisted(model, params, batch, strategy, config)
    elif _strategy_is_fusable(strategy) and config.optimizer == "adam":
        params = run_all_stages_fused(model, params, batch, strategy, config)
    else:
        for stage in strategy:
            params = run_stage(model, params, batch, stage, config)

    total, aux = compute_losses(model, params, batch, dict(OPT_DEFAULT_LOSS_WEIGHTS), config)
    rv, lv, joints3d, joints2d = forward(model, params)
    hp = params_to_handparams(params)
    results = {
        "pred_cam_params": params["cam"],
        "pred_hand_trans": params["trans"],
        "pred_shape_params": hp.shape_params,
        "pred_pose_params": hp.pose_params,
        "pred_right_hand_verts": rv,
        "pred_left_hand_verts": lv,
        "pred_joints_3d": joints3d,
        "pred_joints_2d": joints2d,
        "gt_joints_3d": batch.joints_3d,
        "mano_params_weight": batch.mano_params_weight,
        "collision_loss": aux["collision_loss_batch"],
        "collision_loss_origin_scale": aux["collision_loss_origin_scale"],
        "total_loss": total,
        "joints_2d_loss": aux["joints_2d_loss"],
        "joints_3d_loss": aux["joints_3d_loss"],
        "hand_trans_loss": aux["hand_trans_loss"],
    }
    return params, results
