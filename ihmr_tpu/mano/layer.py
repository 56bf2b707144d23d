"""Differentiable MANO decode and two-hand composition, pure JAX.

This is north-star kernel #1 of the rebuild (SURVEY.md §3.5). The decode is
written batched (leading batch dim everywhere) so the blend-shape and skinning
contractions are large matmuls that XLA tiles onto the MXU; the 16-step
kinematic chain is unrolled statically (fixed tree, no traced control flow).

Semantics match the reference's use of smplx MANO plus its joint augmentation
and two-hand composition:
  * 16 LBS joints + 5 fingertip vertices -> 21 joints/hand
    (ref: src/models/baseline_model.py:228-232)
  * mirrored single-model trick for left hands: flip y/z of the left
    axis-angle params, decode with the right model, negate x of the outputs
    (ref: src/models/optimize_model.py:171-232, mlp_model.py:234-294)
  * left hand anchored to the right wrist plus a predicted 3-d translation
    (ref: baseline_model.py:243-250)
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

# MANO outputs feed millimeter-scale collision/MPJPE metrics; the TPU default
# bf16 matmul precision costs ~0.3% relative vertex error, so the decode pins
# higher precision explicitly. HIGH = 3-pass bf16 (~1e-6 relative, half the
# MXU passes of HIGHEST's 6) — measured indistinguishable from fp32 at the
# metric scale while meaningfully faster inside the refinement scan.
_PREC = jax.lax.Precision.HIGH

from ihmr_tpu.core.rotations import axis_angle_to_matrix, flip_hand_pose
from ihmr_tpu.mano.model import FINGERTIP_VERTEX_IDS, MANO_PARENTS, ManoModel

# numpy (not jnp) on purpose: a module-level device array would initialize
# the XLA backend at import, breaking jax.distributed.initialize for
# multi-process users (it must run before any backend touch)
_TIPS = np.asarray(FINGERTIP_VERTEX_IDS)

import os as _os

_FK_LEVELS = _os.environ.get("IHMR_FK_LEVELS", "0") == "1"
# IHMR_FK_ELEM: unset -> the elementwise-DAG FK runs ONLY in the hoisted
# pose-stage program (where it measured 381.9 -> 340.1 us/step and lifted
# the OPT headline 408 -> 427 hands/sec; round 5); "1" -> every decode
# uses it; "0" -> force the sequential chain everywhere. Scoped this way
# because the nested-scan engines (fused all-stage, MLP train) have a
# history of pathological compiles with restructured FK (the level-
# parallel variant's >12 min fused compile, round 2) — the standalone
# pose program is the measured-safe scope.
_FK_ELEM_ENV = _os.environ.get("IHMR_FK_ELEM")
_FK_ELEM = _FK_ELEM_ENV == "1"
# the MANO tree is the wrist + 5 independent depth-3 finger chains; level d
# holds the d-th joint of every finger (see _fk_levels)
_FK_LEVEL_IDX = tuple(
    tuple(int(k) for k in range(1, 16) if _d == ((k - 1) % 3 + 1))
    for _d in (1, 2, 3)
)


def _fk_chain(rots: "jnp.ndarray", rel_j: "jnp.ndarray"):
    """Sequential FK along MANO_PARENTS: 15 (B,3,3) matmul steps.

    rots (B,16,3,3) local rotations, rel_j (B,16,3) parent-relative rest
    offsets -> (glob_rot (B,16,3,3), glob_pos (B,16,3))."""
    glob_rot = [rots[:, 0]]
    glob_pos = [rel_j[:, 0]]
    for k in range(1, 16):
        p = int(MANO_PARENTS[k])
        glob_rot.append(glob_rot[p] @ rots[:, k])
        glob_pos.append(
            glob_pos[p] + jnp.einsum("bij,bj->bi", glob_rot[p], rel_j[:, k], precision=_PREC)
        )
    return jnp.stack(glob_rot, axis=1), jnp.stack(glob_pos, axis=1)


def _fk_elem(rots: "jnp.ndarray", rel_j: "jnp.ndarray"):
    """FK as a pure ELEMENTWISE DAG over per-component (B,) vectors
    (IHMR_FK_ELEM=1; round 5, VERDICT r4 item 3b).

    The sequential chain dispatches 15 tiny (B,3,3) matmul products whose
    MXU tiles are ~99% padding, and the trace says the pose stage is
    dispatch/latency-bound, not FLOP-bound (see the notes in
    _decode_from_parts). Here every 3x3 product is unrolled into 27
    multiply-adds of (B,)-component vectors (B rides the 128-wide lane
    dimension), so the ENTIRE 15-joint recursion plus the parent-relative
    translations is one elementwise DAG that XLA fuses into a handful of
    VPU kernels with no MXU involvement and no per-joint dispatch gaps.
    Same recursion, same fp32 arithmetic — equivalence-tested against
    _fk_chain (tests/test_mano.py)."""
    # unpack to per-component (B,) vectors once; strided slices fuse into
    # the consuming FMAs
    R = [[[rots[:, k, i, j] for j in range(3)] for i in range(3)] for k in range(16)]
    r = [[rel_j[:, k, i] for i in range(3)] for k in range(16)]

    def mat_mul(A, Bm):  # 3x3 @ 3x3, lists of (B,)
        return [
            [
                A[i][0] * Bm[0][j] + A[i][1] * Bm[1][j] + A[i][2] * Bm[2][j]
                for j in range(3)
            ]
            for i in range(3)
        ]

    def mat_vec(A, v):  # 3x3 @ 3, lists of (B,)
        return [A[i][0] * v[0] + A[i][1] * v[1] + A[i][2] * v[2] for i in range(3)]

    glob_R = [R[0]]
    glob_t = [r[0]]
    for k in range(1, 16):
        p = int(MANO_PARENTS[k])
        glob_R.append(mat_mul(glob_R[p], R[k]))
        mv = mat_vec(glob_R[p], r[k])
        glob_t.append([glob_t[p][i] + mv[i] for i in range(3)])

    # repack: (B,16,3,3) and (B,16,3)
    Rk = jnp.stack(
        [
            jnp.stack([jnp.stack(row, axis=-1) for row in gk], axis=-2)
            for gk in glob_R
        ],
        axis=1,
    )
    tk = jnp.stack([jnp.stack(gt, axis=-1) for gt in glob_t], axis=1)
    return Rk, tk


def _fk_levels(rots: "jnp.ndarray", rel_j: "jnp.ndarray"):
    """Level-parallel FK: 3 batched (B,5,3,3) einsum levels (IHMR_FK_LEVELS).

    Exactly the same recursion as _fk_chain, grouped by tree depth: every
    finger's depth-d joint has its depth-(d-1) joint as parent, so each
    level is one batched composition against the previous level."""
    l1, l2, l3 = (list(ix) for ix in _FK_LEVEL_IDX)
    R0 = rots[:, 0]  # (B,3,3)
    t0 = rel_j[:, 0]  # (B,3)
    Rs = [R0[:, None]]  # accumulated per level
    ts = [t0[:, None]]
    prev_R = jnp.broadcast_to(R0[:, None], rots[:, l1].shape)
    prev_t = jnp.broadcast_to(t0[:, None], rel_j[:, l1].shape)
    for idx in (l1, l2, l3):
        cur_t = prev_t + jnp.einsum(
            "bkij,bkj->bki", prev_R, rel_j[:, idx], precision=_PREC
        )
        cur_R = jnp.einsum(
            "bkij,bkjl->bkil", prev_R, rots[:, idx], precision=_PREC
        )
        Rs.append(cur_R)
        ts.append(cur_t)
        prev_R, prev_t = cur_R, cur_t
    # restore joint order: stacking order is [0 | level1 | level2 | level3]
    order = [0] + l1 + l2 + l3
    inv = np.argsort(np.asarray(order))
    R = jnp.concatenate(Rs, axis=1)[:, inv]
    t = jnp.concatenate(ts, axis=1)[:, inv]
    return R, t


@flax.struct.dataclass
class HandParams:
    """The 122-dim two-hand parameter vector, split into its factor groups.

    Layout of the flat vector (ref: src/options/base_options.py:33-38 and
    src/models/optimize_model.py:235-251):
      [cam(3) | right pose(48) | left pose(48) | right betas(10) |
       left betas(10) | hand trans(3)]
    where each 48-d pose = [global orient(3) | articulation(45)].
    """

    cam: jnp.ndarray  # (..., 3)
    right_orient: jnp.ndarray  # (..., 3)
    left_orient: jnp.ndarray  # (..., 3)
    right_pose: jnp.ndarray  # (..., 45)
    left_pose: jnp.ndarray  # (..., 45)
    right_shape: jnp.ndarray  # (..., 10)
    left_shape: jnp.ndarray  # (..., 10)
    trans: jnp.ndarray  # (..., 3)

    @classmethod
    def from_flat(cls, params: jnp.ndarray) -> "HandParams":
        assert params.shape[-1] == 122, params.shape
        return cls(
            cam=params[..., 0:3],
            right_orient=params[..., 3:6],
            right_pose=params[..., 6:51],
            left_orient=params[..., 51:54],
            left_pose=params[..., 54:99],
            right_shape=params[..., 99:109],
            left_shape=params[..., 109:119],
            trans=params[..., 119:122],
        )

    def to_flat(self) -> jnp.ndarray:
        return jnp.concatenate(
            [
                self.cam,
                self.right_orient,
                self.right_pose,
                self.left_orient,
                self.left_pose,
                self.right_shape,
                self.left_shape,
                self.trans,
            ],
            axis=-1,
        )

    @property
    def pose_params(self) -> jnp.ndarray:
        """(..., 96) = [right 48 | left 48]."""
        return jnp.concatenate(
            [self.right_orient, self.right_pose, self.left_orient, self.left_pose], axis=-1
        )

    @property
    def shape_params(self) -> jnp.ndarray:
        """(..., 20) = [right 10 | left 10]."""
        return jnp.concatenate([self.right_shape, self.left_shape], axis=-1)


def mano_decode(
    model: ManoModel,
    global_orient: jnp.ndarray,  # (B, 3)
    hand_pose: jnp.ndarray,  # (B, 45)
    betas: jnp.ndarray,  # (B, 10)
    hands_mean: Optional[jnp.ndarray] = None,  # (45,) smplx flat_hand_mean=False offset
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-hand MANO forward. Returns (verts (B, 778, 3), joints (B, 16, 3))."""
    if hands_mean is not None:
        hand_pose = hand_pose + hands_mean
    B = global_orient.shape[0]
    dtype = model.v_template.dtype

    pose = jnp.concatenate([global_orient, hand_pose], axis=-1).reshape(B, 16, 3)
    rots = axis_angle_to_matrix(pose.astype(dtype))  # (B, 16, 3, 3)

    v_shaped, j_rest, rel_j = shape_rest_parts(model, betas)
    return _decode_from_parts(model, rots, v_shaped, j_rest, rel_j)


def shape_rest_parts(
    model: ManoModel, betas: jnp.ndarray  # (B, 10)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The betas-only decode terms: (v_shaped (B,778,3), j_rest (B,16,3),
    rel_j (B,16,3) parent-relative rest offsets).

    Loop-invariant whenever the shapes are frozen — pose-only refinement
    stages hoist these out of the optimizer step (two_hand_pose_payload)."""
    dtype = model.v_template.dtype
    # shape blendshapes (MXU: (B,10) x (10, 2334))
    v_shaped = model.v_template + jnp.einsum(
        "bs,vcs->bvc", betas.astype(dtype), model.shapedirs, precision=_PREC
    )
    j_rest = jnp.einsum("jv,bvc->bjc", model.j_regressor, v_shaped, precision=_PREC)  # (B, 16, 3)
    rel_j = j_rest - jnp.where(
        (MANO_PARENTS >= 0)[None, :, None],
        j_rest[:, jnp.maximum(MANO_PARENTS, 0)],
        0.0,
    )
    return v_shaped, j_rest, rel_j


def _decode_from_parts(
    model: ManoModel,
    rots: jnp.ndarray,  # (B, 16, 3, 3) local joint rotations incl. root
    v_shaped: jnp.ndarray,  # (B, 778, 3)
    j_rest: jnp.ndarray,  # (B, 16, 3)
    rel_j: jnp.ndarray,  # (B, 16, 3)
    fk: Optional[str] = None,  # None = env-selected; 'elem' | 'chain'
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pose blendshapes + FK + skinning given precomputed rest-shape parts."""
    B = rots.shape[0]
    dtype = v_shaped.dtype

    # pose blendshapes (MXU: (B,135) x (135, 2334))
    eye = jnp.eye(3, dtype=dtype)
    pose_feature = (rots[:, 1:] - eye).reshape(B, 135)
    v_posed = v_shaped + jnp.einsum(
        "bl,lk->bk", pose_feature, model.posedirs, precision=_PREC
    ).reshape(
        B, 778, 3
    )

    # forward kinematics along the (static) MANO tree. NOTE: the default is
    # the sequential chain; a level-parallel variant (the depth-4 tree as 3
    # batched (B,5,3,3) einsum levels instead of 15 sequential products) was
    # tried TWICE in round 2 and rejected: at the eager defaults it measured
    # 105 -> 97 hands/sec (tiny batched matmuls pad worse in lane layout
    # than this chain, which XLA overlaps with the blend-shape work), and at
    # the round-2 lazy defaults its fused program compiled pathologically
    # (>12 min vs ~40 s) — the batched-level einsums inside the nested
    # stage/block/step scans blow up XLA's scheduling. With the round-3
    # stage-hoisted engine the pose stage is a STANDALONE program, so the
    # variant is kept re-measurable behind IHMR_FK_LEVELS=1 (read at trace
    # time; _fk_levels is equivalence-tested against _fk_chain).
    if fk is None:
        fk_fn = _fk_elem if _FK_ELEM else _fk_levels if _FK_LEVELS else _fk_chain
    else:
        fk_fn = {"elem": _fk_elem, "chain": _fk_chain}[fk]
    R, t = fk_fn(rots, rel_j)

    # remove rest pose: per-joint affine = [R | t - R @ j_rest]
    t_rel = t - jnp.einsum("bjik,bjk->bji", R, j_rest, precision=_PREC)
    # skinning (MXU: (778,16) x (16, B*12))
    # NOTE (round-4 negative): skinning HALF the rows (even stride, the
    # lean pose step's true consumer set under frozen-positions stride-2
    # collision) measured WORSE on the standalone pose program (372.8 ->
    # 394.4 us/step at B=128 v5e, probe concat-back included) — the step is
    # latency/dispatch-bound (FK chain of 15 sequential (B,3,3) products +
    # small-op tail), not skinning-row-bound, so row-sliced decode plumbing
    # does not pay. Level-parallel FK on the standalone pose program is a
    # THIRD measured negative (372.8 -> 430.4 us/step, IHMR_FK_LEVELS=1).
    # Round-5 POSITIVE: the elementwise-DAG FK (_fk_elem) — the same
    # recursion with every 3x3 product unrolled to (B,)-component FMAs so
    # no tiny matmul ever pads an MXU tile — measured 381.9 -> 340.1
    # us/step on the standalone pose program (stage_bench, B=128 v5e).
    Rv = jnp.einsum("vj,bjik->bvik", model.lbs_weights, R, precision=_PREC)
    tv = jnp.einsum("vj,bji->bvi", model.lbs_weights, t_rel, precision=_PREC)
    verts = jnp.einsum("bvik,bvk->bvi", Rv, v_posed, precision=_PREC) + tv
    return verts, t


def joints21(verts: jnp.ndarray, lbs_joints: jnp.ndarray) -> jnp.ndarray:
    """Append the 5 fingertip vertices to the 16 LBS joints (B, 21, 3)."""
    return jnp.concatenate([lbs_joints, verts[:, _TIPS]], axis=1)


def two_hand_decode_mirrored(
    right_model: ManoModel,
    right_orient: jnp.ndarray,
    left_orient: jnp.ndarray,
    right_pose: jnp.ndarray,
    left_pose: jnp.ndarray,
    right_shape: jnp.ndarray,
    left_shape: jnp.ndarray,
    trans: jnp.ndarray,
    hands_mean: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Two-hand decode through ONE (right) model at batch 2B.

    Returns (right_verts (B,778,3), left_verts (B,778,3), joints (B,42,3)).
    The left-hand mesh produced this way has inward-facing winding under the
    right model's faces; collision/visualization must flip winding for left
    (handled by consumers via ``ManoModel.faces[:, ::-1]``).
    """
    B = right_orient.shape[0]
    orient = jnp.concatenate([right_orient, flip_hand_pose(left_orient)], axis=0)
    pose = jnp.concatenate([right_pose, flip_hand_pose(left_pose)], axis=0)
    betas = jnp.concatenate([right_shape, left_shape], axis=0)

    verts, lbs_j = mano_decode(right_model, orient, pose, betas, hands_mean)
    return _mirror_and_anchor(verts, lbs_j, trans, B)


def _mirror_and_anchor(
    verts: jnp.ndarray,  # (2B, 778, 3) right-model decode, [right | flipped-left]
    lbs_j: jnp.ndarray,  # (2B, 16, 3)
    trans: jnp.ndarray,  # (B, 3)
    B: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Shared tail of the mirrored two-hand decode: mirror the left half and
    anchor its wrist to the right wrist + predicted translation."""
    joints = joints21(verts, lbs_j)

    right_verts, left_verts = verts[:B], verts[B:]
    right_joints, left_joints = joints[:B], joints[B:]
    mirror = jnp.asarray([-1.0, 1.0, 1.0], verts.dtype)
    left_verts = left_verts * mirror
    left_joints = left_joints * mirror

    # anchor left wrist to right wrist + predicted translation
    shift = trans[:, None, :] + right_joints[:, 0:1, :] - left_joints[:, 0:1, :]
    left_verts = left_verts + shift
    left_joints = left_joints + shift
    return right_verts, left_verts, jnp.concatenate([right_joints, left_joints], axis=1)


def two_hand_identity_orient_payload(
    right_model: ManoModel,
    right_pose: jnp.ndarray,  # (B, 45)
    left_pose: jnp.ndarray,  # (B, 45)
    right_shape: jnp.ndarray,  # (B, 10)
    left_shape: jnp.ndarray,  # (B, 10)
    hands_mean: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode both hands at IDENTITY global orient -> (verts_id (2B,778,3),
    lbs_j_id (2B,16,3)).

    Global orient enters MANO LBS as a left-multiplication of every joint's
    global transform by a rotation about the rest root joint: the pose
    blendshapes exclude the root (``rots[:, 1:]``), the FK recursion gives
    ``glob_rot'[k] = R0 @ glob_rot_id[k]`` and ``glob_pos'[k] = j0 + R0 @
    (glob_pos_id[k] - j0)``, and skinning is linear in those transforms (with
    per-vertex weights summing to 1). Hence for ANY orient R0:

        verts(R0) = R0 @ (verts_id - j0) + j0,   j0 = lbs_j_id[:, 0]

    exactly — which lets orient-only refinement stages hoist the full decode
    out of the optimizer step (``two_hand_decode_from_identity``)."""
    pose = jnp.concatenate([right_pose, flip_hand_pose(left_pose)], axis=0)
    betas = jnp.concatenate([right_shape, left_shape], axis=0)
    zero_orient = jnp.zeros((pose.shape[0], 3), pose.dtype)
    return mano_decode(right_model, zero_orient, pose, betas, hands_mean)


def two_hand_decode_from_identity(
    verts_id: jnp.ndarray,  # (2B, 778, 3)
    lbs_j_id: jnp.ndarray,  # (2B, 16, 3)
    right_orient: jnp.ndarray,  # (B, 3)
    left_orient: jnp.ndarray,  # (B, 3)
    trans: jnp.ndarray,  # (B, 3)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Apply global orients to an identity-orient payload; exact (see
    ``two_hand_identity_orient_payload``). Returns the same triple as
    ``two_hand_decode_mirrored``."""
    B = right_orient.shape[0]
    orient = jnp.concatenate([right_orient, flip_hand_pose(left_orient)], axis=0)
    R0 = axis_angle_to_matrix(orient.astype(verts_id.dtype))  # (2B, 3, 3)
    pivot = lbs_j_id[:, 0:1]  # rest root joint — the FK rotation pivot
    verts = (
        jnp.einsum("bij,bvj->bvi", R0, verts_id - pivot, precision=_PREC) + pivot
    )
    lbs_j = (
        jnp.einsum("bij,bnj->bni", R0, lbs_j_id - pivot, precision=_PREC) + pivot
    )
    return _mirror_and_anchor(verts, lbs_j, trans, B)


def two_hand_pose_payload(
    right_model: ManoModel,
    right_orient: jnp.ndarray,  # (B, 3)
    left_orient: jnp.ndarray,  # (B, 3)
    right_shape: jnp.ndarray,  # (B, 10)
    left_shape: jnp.ndarray,  # (B, 10)
):
    """Hoistable decode terms for POSE-only refinement stages (orient and
    shapes frozen): the betas-only rest-shape parts (shape_rest_parts) plus
    the frozen root rotation matrix, in the mirrored 2B layout.

    EXACT partial evaluation of ``two_hand_decode_mirrored``: with shapes
    frozen, v_shaped / j_rest / rel_j never change across the stage's steps;
    with global orient frozen, rots[:, 0] is a constant matrix. Only the 15
    finger-joint rotations, the pose blendshapes, FK and skinning remain in
    the per-step program (two_hand_decode_from_pose_payload)."""
    orient = jnp.concatenate([right_orient, flip_hand_pose(left_orient)], axis=0)
    betas = jnp.concatenate([right_shape, left_shape], axis=0)
    dtype = right_model.v_template.dtype
    rot0 = axis_angle_to_matrix(orient.astype(dtype))  # (2B, 3, 3)
    v_shaped, j_rest, rel_j = shape_rest_parts(right_model, betas)
    return v_shaped, j_rest, rel_j, rot0


def two_hand_decode_from_pose_payload(
    right_model: ManoModel,
    payload,  # from two_hand_pose_payload
    right_pose: jnp.ndarray,  # (B, 45)
    left_pose: jnp.ndarray,  # (B, 45)
    trans: jnp.ndarray,  # (B, 3)
    hands_mean: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decode with the rest-shape parts and root rotation hoisted; exact
    (see two_hand_pose_payload). Returns the same triple as
    ``two_hand_decode_mirrored``."""
    v_shaped, j_rest, rel_j, rot0 = payload
    B = right_pose.shape[0]
    dtype = v_shaped.dtype
    hand_pose = jnp.concatenate([right_pose, flip_hand_pose(left_pose)], axis=0)
    if hands_mean is not None:
        hand_pose = hand_pose + hands_mean
    rots_f = axis_angle_to_matrix(hand_pose.reshape(2 * B, 15, 3).astype(dtype))
    rots = jnp.concatenate([rot0[:, None], rots_f], axis=1)  # (2B, 16, 3, 3)
    # elementwise-DAG FK by default in THIS (hoisted pose-stage) program —
    # the round-5 measured win (381.9 -> 340.1 us/step); IHMR_FK_ELEM=0
    # forces the chain back (see the env note at _FK_ELEM_ENV)
    fk = "chain" if _FK_ELEM_ENV == "0" else "elem"
    verts, lbs_j = _decode_from_parts(right_model, rots, v_shaped, j_rest, rel_j, fk=fk)
    return _mirror_and_anchor(verts, lbs_j, trans, B)


def two_hand_shape_affine_payload(
    right_model: ManoModel,
    right_orient: jnp.ndarray,  # (B, 3)
    left_orient: jnp.ndarray,  # (B, 3)
    right_pose: jnp.ndarray,  # (B, 45)
    left_pose: jnp.ndarray,  # (B, 45)
    right_shape0: jnp.ndarray,  # (B, 10)
    left_shape0: jnp.ndarray,  # (B, 10)
    hands_mean: Optional[jnp.ndarray] = None,
):
    """Base + 20 directional columns of the two-hand decode as an affine
    function of the shape coefficients, built with ONE decode at 21x batch.

    EXACT, not a linearization error: with pose/orient fixed the decode is
    affine in betas — the rotation matrices and the pose-blendshape feature
    are betas-free, so ``v_shaped``, ``j_rest``, the FK translations (fixed
    parent rotations times the affine ``rel_j``), the skinning output
    (fixed ``Rv`` times affine ``v_posed`` plus affine ``tv``;
    ``mano_decode``) and the mirror/anchor tail (``_mirror_and_anchor``,
    at trans=0) are all compositions of affine maps. Hence

        out(shape0 + d) = out(shape0) + sum_i d_i * (out(shape0+e_i) - out(shape0))

    holds exactly for ANY d — which lets shape-only refinement stages hoist
    the full decode out of the optimizer step
    (``two_hand_decode_from_shape_affine``).

    Returns (base, basis): base = (rv0, lv0, j0) evaluated at
    (shape0, trans=0); basis = matching tuple of (20, B, ...) directional
    deltas, ordered [right e_0..e_9 | left e_0..e_9].
    """
    B = right_orient.shape[0]
    dtype = right_shape0.dtype
    K = 21  # base + 20 unit directions

    def tile(x):
        return jnp.broadcast_to(x[None], (K,) + x.shape).reshape((K * B,) + x.shape[1:])

    eye = jnp.eye(10, dtype=dtype)
    zero = jnp.zeros((10, 10), dtype)
    one = jnp.zeros((1, 10), dtype)
    d_right = jnp.concatenate([one, eye, zero], axis=0)  # (21, 10)
    d_left = jnp.concatenate([one, zero, eye], axis=0)  # (21, 10)
    shape_r = (right_shape0[None] + d_right[:, None]).reshape(K * B, 10)
    shape_l = (left_shape0[None] + d_left[:, None]).reshape(K * B, 10)

    rv, lv, joints = two_hand_decode_mirrored(
        right_model,
        tile(right_orient),
        tile(left_orient),
        tile(right_pose),
        tile(left_pose),
        shape_r,
        shape_l,
        jnp.zeros((K * B, 3), dtype),
        hands_mean,
    )

    def split(x):
        x = x.reshape((K, B) + x.shape[1:])
        return x[0], x[1:] - x[0]

    (rv0, brv), (lv0, blv), (j0, bj) = split(rv), split(lv), split(joints)
    return (rv0, lv0, j0), (brv, blv, bj)


def two_hand_decode_from_shape_affine(
    base,  # (rv0 (B,778,3), lv0 (B,778,3), j0 (B,42,3)) at (shape0, trans=0)
    basis,  # ((20,B,778,3), (20,B,778,3), (20,B,42,3)) directional deltas
    right_shape0: jnp.ndarray,  # (B, 10)
    left_shape0: jnp.ndarray,  # (B, 10)
    right_shape: jnp.ndarray,  # (B, 10)
    left_shape: jnp.ndarray,  # (B, 10)
    trans: jnp.ndarray,  # (B, 3)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Evaluate the affine shape payload at new shapes; exact (see
    ``two_hand_shape_affine_payload``). Returns the same triple as
    ``two_hand_decode_mirrored``."""
    rv0, lv0, j0 = base
    brv, blv, bj = basis
    d = jnp.concatenate(
        [right_shape - right_shape0, left_shape - left_shape0], axis=-1
    ).astype(rv0.dtype)  # (B, 20)
    rv = rv0 + jnp.einsum("kbvc,bk->bvc", brv, d, precision=_PREC)
    lv = lv0 + jnp.einsum("kbvc,bk->bvc", blv, d, precision=_PREC)
    j = j0 + jnp.einsum("kbnc,bk->bnc", bj, d, precision=_PREC)
    t = trans[:, None, :]
    joints = jnp.concatenate([j[:, :21], j[:, 21:] + t], axis=1)
    return rv, lv + t, joints


def two_hand_decode(
    right_model: ManoModel,
    left_model: ManoModel,
    pose_params: jnp.ndarray,  # (B, 96)
    shape_params: jnp.ndarray,  # (B, 20)
    trans: jnp.ndarray,  # (B, 3)
    hands_mean_right: Optional[jnp.ndarray] = None,
    hands_mean_left: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Two-model decode (baseline path; ref baseline_model.py:208-254)."""
    outs = {}
    for hand, model, mean, pose_shift, betas_shift in (
        ("right", right_model, hands_mean_right, 0, 0),
        ("left", left_model, hands_mean_left, 48, 10),
    ):
        orient = pose_params[:, pose_shift : pose_shift + 3]
        pose = pose_params[:, pose_shift + 3 : pose_shift + 48]
        betas = shape_params[:, betas_shift : betas_shift + 10]
        verts, lbs_j = mano_decode(model, orient, pose, betas, mean)
        outs[hand] = (verts, joints21(verts, lbs_j))

    right_verts, right_joints = outs["right"]
    left_verts, left_joints = outs["left"]
    shift = trans[:, None, :] + right_joints[:, 0:1, :] - left_joints[:, 0:1, :]
    left_verts = left_verts + shift
    left_joints = left_joints + shift
    return right_verts, left_verts, jnp.concatenate([right_joints, left_joints], axis=1)
