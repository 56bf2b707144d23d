"""Synthetic two-hand data generation.

Produces geometrically-consistent samples for tests and benchmarks without
the licensed InterHand2.6M / MANO assets: ground-truth parameters are sampled,
decoded through the (synthetic or real) MANO layer into joints, and noisy
copies play the role of the baseline network's initial predictions — exactly
the annotation + prediction schema the OPT/MLP pipelines consume
(ref: src/data/opt_dataset.py:120-175, src/data/mlp_dataset.py:140-210).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ihmr_tpu.core.projection import orthographic_project
from ihmr_tpu.mano.layer import two_hand_decode_mirrored
from ihmr_tpu.mano.model import ManoModel
from ihmr_tpu.refine.mlp_engine import MLPBatch
from ihmr_tpu.refine.opt_engine import OptBatch, ParamDict, params_from_init


import jax as _jax


@_jax.jit
def _decode(model: ManoModel, pose, shape, trans, cam):
    rv, lv, j3 = two_hand_decode_mirrored(
        model,
        pose[:, 0:3],
        pose[:, 48:51],
        pose[:, 3:48],
        pose[:, 51:96],
        shape[:, :10],
        shape[:, 10:],
        trans,
    )
    return rv, lv, j3, orthographic_project(j3, cam)


def generate(model: ManoModel, batch: int, seed: int, noise: float) -> Dict[str, jnp.ndarray]:
    """Sample GT params + noisy init predictions, decode both.

    Runs on the HOST CPU backend: eager (un-jitted) decode on a remote TPU
    would dispatch hundreds of tiny ops over the tunnel (~30 ms each). Data
    generation is setup, not the benchmarked workload.

    IMPORTANT: the 'init joints' stand in for the reference's separate
    keypoint-prediction model (the prediction pkl's ``joints_2d/joints_3d``
    keys, which are NOT the decoded init MANO joints; ref
    src/data/data_utils.py:59-62). They must differ from decode(init params),
    otherwise the OPT self-consistency losses start at exactly zero and no
    snapshot can ever be accepted. We model the keypoint net as more accurate
    than the parameter regression: init_joints = gt_joints + small jitter.
    """
    import jax

    cpu = jax.devices("cpu")[0]
    model_cpu = jax.device_put(model, cpu)
    with jax.default_device(cpu):
        return _generate_on_host(model_cpu, batch, seed, noise)


def _generate_on_host(model: ManoModel, batch: int, seed: int, noise: float) -> Dict[str, jnp.ndarray]:
    rng = np.random.RandomState(seed)
    gt_pose = jnp.asarray((rng.randn(batch, 96) * 0.2).astype(np.float32))
    gt_shape = jnp.asarray((rng.randn(batch, 20) * 0.5).astype(np.float32))
    cam = np.tile(np.array([[5.0, 0.0, 0.0]], np.float32), (batch, 1))
    cam[:, 1:] += rng.randn(batch, 2).astype(np.float32) * 0.02
    gt_cam = jnp.asarray(cam)
    gt_trans = jnp.asarray((rng.randn(batch, 3) * 0.02).astype(np.float32))

    _, _, gt_j3, gt_j2 = _decode(model, gt_pose, gt_shape, gt_trans, gt_cam)

    init_pose = gt_pose + jnp.asarray(rng.randn(batch, 96).astype(np.float32)) * noise
    init_shape = gt_shape + jnp.asarray(rng.randn(batch, 20).astype(np.float32)) * noise
    init_trans = gt_trans + jnp.asarray(rng.randn(batch, 3).astype(np.float32)) * noise * 0.2
    init_cam = gt_cam
    # keypoint-network-like joint predictions: near-GT, independent noise
    kp_noise = noise * 0.02
    init_j3 = gt_j3 + jnp.asarray(rng.randn(*gt_j3.shape).astype(np.float32)) * kp_noise
    init_j2 = gt_j2 + jnp.asarray(rng.randn(*gt_j2.shape).astype(np.float32)) * kp_noise

    return dict(
        gt_pose=gt_pose,
        gt_shape=gt_shape,
        gt_cam=gt_cam,
        gt_trans=gt_trans,
        gt_j3=gt_j3,
        gt_j2=gt_j2,
        init_pose=init_pose,
        init_shape=init_shape,
        init_cam=init_cam,
        init_trans=init_trans,
        init_j3=init_j3,
        init_j2=init_j2,
    )


def generate_interlocked(
    model: ManoModel, batch: int, seed: int, noise: float
) -> Dict[str, jnp.ndarray]:
    """Hard-case samples: interlocked, deeply-penetrating curled fingers.

    The standard ``generate`` protocol produces broad shallow contact
    (~20-40% of vertices penetrating a few mm). This generator poses the two
    hands facing each other (left flipped ~pi about y), fingers curled, wrists
    offset so fingertips drive into the opposing palm: measured on the
    synthetic model, only ~0.5-2% of vertices penetrate but up to 0.14 units
    (~2 finger widths) deep — SPARSE deep contacts, the adversarial case for
    in-loop collision vertex/face subsampling (a strided subset can miss a
    thin deep contact entirely). Used by the quality study + regression guard
    that earn the shipping sub/fsub defaults (VERDICT round 1, item 3).
    """
    import jax

    cpu = jax.devices("cpu")[0]
    model_cpu = jax.device_put(model, cpu)
    with jax.default_device(cpu):
        rng = np.random.RandomState(seed)
        pose = np.zeros((batch, 96), np.float32)
        curl = rng.uniform(0.5, 1.1, size=(batch, 1)).astype(np.float32)
        for f in range(5):
            for k in range(3):
                base = 3 + (f * 3 + k) * 3
                jitter = rng.randn(batch).astype(np.float32) * 0.1
                pose[:, base + 2] = curl[:, 0] + jitter  # right finger curl
                pose[:, 48 + base + 2] = curl[:, 0] + rng.randn(batch).astype(np.float32) * 0.1
        # left hand faces the right: ~pi rotation about y, jittered
        pose[:, 49] = np.pi + rng.randn(batch).astype(np.float32) * 0.15
        pose += rng.randn(batch, 96).astype(np.float32) * 0.05
        gt_pose = jnp.asarray(pose)
        gt_shape = jnp.asarray((rng.randn(batch, 20) * 0.3).astype(np.float32))
        cam = np.tile(np.array([[5.0, 0.0, 0.0]], np.float32), (batch, 1))
        cam[:, 1:] += rng.randn(batch, 2).astype(np.float32) * 0.02
        gt_cam = jnp.asarray(cam)
        trans = np.zeros((batch, 3), np.float32)
        trans[:, 0] = rng.uniform(0.08, 0.15, size=batch)  # wrist offset -> overlap
        trans[:, 1:] = rng.randn(batch, 2).astype(np.float32) * 0.015
        gt_trans = jnp.asarray(trans)

        _, _, gt_j3, gt_j2 = _decode(model_cpu, gt_pose, gt_shape, gt_trans, gt_cam)

        init_pose = gt_pose + jnp.asarray(rng.randn(batch, 96).astype(np.float32)) * noise
        init_shape = gt_shape + jnp.asarray(rng.randn(batch, 20).astype(np.float32)) * noise
        init_trans = gt_trans + jnp.asarray(rng.randn(batch, 3).astype(np.float32)) * noise * 0.2
        kp_noise = noise * 0.02
        init_j3 = gt_j3 + jnp.asarray(rng.randn(*gt_j3.shape).astype(np.float32)) * kp_noise
        init_j2 = gt_j2 + jnp.asarray(rng.randn(*gt_j2.shape).astype(np.float32)) * kp_noise

        return dict(
            gt_pose=gt_pose,
            gt_shape=gt_shape,
            gt_cam=gt_cam,
            gt_trans=gt_trans,
            gt_j3=gt_j3,
            gt_j2=gt_j2,
            init_pose=init_pose,
            init_shape=init_shape,
            init_cam=gt_cam,
            init_trans=init_trans,
            init_j3=init_j3,
            init_j2=init_j2,
        )


def generate_grazing(
    model: ManoModel, batch: int, seed: int, noise: float
) -> Dict[str, jnp.ndarray]:
    """Grazing-contact samples: the hands a hair apart, penetration ~zero.

    Same facing/curled pose family as ``generate_interlocked`` but with the
    wrist offset pushed just past the fingertip-to-palm distance, so GT
    penetration is near zero (a thin graze on some samples, a small gap on
    others). This is the OVERSHOOT benchmark (round 5, VERDICT r4 item 6):
    with no real interpenetration to resolve, any in-loop collision
    pressure — margins, stale frozen payloads, grid smearing — can only
    push the hands APART from GT, so the gate metric is GT-joint error,
    with residual collision as the sanity row. Offset calibration is
    recorded in the docstring of scripts/quality_study.py.
    """
    import jax

    cpu = jax.devices("cpu")[0]
    model_cpu = jax.device_put(model, cpu)
    with jax.default_device(cpu):
        rng = np.random.RandomState(seed)
        pose = np.zeros((batch, 96), np.float32)
        curl = rng.uniform(0.5, 1.1, size=(batch, 1)).astype(np.float32)
        for f in range(5):
            for k in range(3):
                base = 3 + (f * 3 + k) * 3
                pose[:, base + 2] = curl[:, 0] + rng.randn(batch).astype(np.float32) * 0.1
                pose[:, 48 + base + 2] = curl[:, 0] + rng.randn(batch).astype(np.float32) * 0.1
        pose[:, 49] = np.pi + rng.randn(batch).astype(np.float32) * 0.15
        pose += rng.randn(batch, 96).astype(np.float32) * 0.05
        gt_pose = jnp.asarray(pose)
        gt_shape = jnp.asarray((rng.randn(batch, 20) * 0.3).astype(np.float32))
        cam = np.tile(np.array([[5.0, 0.0, 0.0]], np.float32), (batch, 1))
        cam[:, 1:] += rng.randn(batch, 2).astype(np.float32) * 0.02
        gt_cam = jnp.asarray(cam)
        # ADAPTIVE offset: decode once at trans=0, then push the left hand
        # +x until its AABB just clears the right hand's, minus a per-sample
        # graze band (-2 mm .. +6 mm in mesh units). trans enters the
        # mirrored composition purely additively on the left half
        # (mano/layer.py::_mirror_and_anchor), so the shifted decode is
        # exact without re-decoding. A fixed offset band leaves pose-jitter
        # outliers interlocked (one seed-0 sample measured penetration 0.19
        # at offset 0.16-0.22 — deeper than the interlocked bench itself).
        rv0, lv0, _ = two_hand_decode_mirrored(
            model_cpu,
            gt_pose[:, 0:3], gt_pose[:, 48:51],
            gt_pose[:, 3:48], gt_pose[:, 51:96],
            gt_shape[:, :10], gt_shape[:, 10:],
            jnp.zeros((batch, 3), jnp.float32),
        )
        gap = rng.uniform(-0.002, 0.006, size=batch).astype(np.float32)
        tx = (
            np.asarray(jnp.max(rv0[:, :, 0], axis=1))
            - np.asarray(jnp.min(lv0[:, :, 0], axis=1))
            + gap
        )
        trans = np.zeros((batch, 3), np.float32)
        trans[:, 0] = tx
        trans[:, 1:] = rng.randn(batch, 2).astype(np.float32) * 0.005
        gt_trans = jnp.asarray(trans)

        _, _, gt_j3, gt_j2 = _decode(model_cpu, gt_pose, gt_shape, gt_trans, gt_cam)

        init_pose = gt_pose + jnp.asarray(rng.randn(batch, 96).astype(np.float32)) * noise
        init_shape = gt_shape + jnp.asarray(rng.randn(batch, 20).astype(np.float32)) * noise
        init_trans = gt_trans + jnp.asarray(rng.randn(batch, 3).astype(np.float32)) * noise * 0.2
        kp_noise = noise * 0.02
        init_j3 = gt_j3 + jnp.asarray(rng.randn(*gt_j3.shape).astype(np.float32)) * kp_noise
        init_j2 = gt_j2 + jnp.asarray(rng.randn(*gt_j2.shape).astype(np.float32)) * kp_noise

        return dict(
            gt_pose=gt_pose,
            gt_shape=gt_shape,
            gt_cam=gt_cam,
            gt_trans=gt_trans,
            gt_j3=gt_j3,
            gt_j2=gt_j2,
            init_pose=init_pose,
            init_shape=init_shape,
            init_cam=gt_cam,
            init_trans=init_trans,
            init_j3=init_j3,
            init_j2=init_j2,
        )


def make_opt_inputs(
    model: ManoModel,
    batch: int = 8,
    seed: int = 0,
    noise: float = 0.15,
    interlocked: bool = False,
    variant: str = None,
) -> Tuple[ParamDict, OptBatch]:
    """Build (initial params, OptBatch) for the OPT workload.

    ``variant`` selects the benchmark family (round-5 quality-bench
    diversity, VERDICT r4 item 6):
      * ``standard``     broad shallow contact (default; ``generate``)
      * ``interlocked``  sparse deep finger interlocks (``generate_interlocked``)
      * ``grazing``      near-zero penetration — hands posed a hair apart so
                         in-loop pressure can only overshoot (``generate_grazing``)
      * ``single``       one valid hand (hand_type [1,0]): the collision
                         loss is masked to zero by the reference contract
                         (ops/collision.py::depths_to_loss) and the gate is
                         purely GT-fitting quality
    ``interlocked=True`` is the legacy spelling of variant='interlocked'.
    """
    if variant is None:
        variant = "interlocked" if interlocked else "standard"
    gen = {
        "standard": generate,
        "single": generate,
        "interlocked": generate_interlocked,
        "grazing": generate_grazing,
    }[variant]
    d = gen(model, batch, seed, noise)
    ones = jnp.ones((batch, 42, 1), jnp.float32)
    ones1 = jnp.ones((batch, 1), jnp.float32)

    params = params_from_init(d["init_cam"], d["init_pose"], d["init_shape"], d["init_trans"])
    init_trans_j = d["init_j3"][:, 21, :] - d["init_j3"][:, 0, :]

    hand_type = (
        jnp.concatenate(
            [jnp.ones((batch, 1), jnp.float32), jnp.zeros((batch, 1), jnp.float32)],
            axis=1,
        )
        if variant == "single"
        else jnp.ones((batch, 2), jnp.float32)
    )
    opt_batch = OptBatch(
        hand_type_array=hand_type,
        hand_type_valid=ones1,
        joints_2d=jnp.concatenate([d["gt_j2"], ones], axis=-1),
        joints_3d=jnp.concatenate([d["gt_j3"], ones], axis=-1),
        gt_pose_params=d["gt_pose"],
        gt_shape_params=d["gt_shape"],
        mano_params_weight=jnp.ones((batch, 2), jnp.float32),
        hand_trans=jnp.concatenate([d["gt_trans"], ones1], axis=-1)[:, None, :],
        init_joints_2d=jnp.concatenate([d["init_j2"], ones], axis=-1),
        init_joints_3d=jnp.concatenate([d["init_j3"], ones], axis=-1),
        init_hand_trans_j=jnp.concatenate([init_trans_j, ones1], axis=-1)[:, None, :],
    )
    return params, opt_batch


def make_mlp_inputs(
    model: ManoModel,
    batch: int = 8,
    seed: int = 0,
    noise: float = 0.15,
    index_offset: int = 0,
) -> MLPBatch:
    """Build an MLPBatch (cached baseline outputs play the img_feat role)."""
    d = generate(model, batch, seed, noise)
    rng = np.random.RandomState(seed + 101)
    ones = jnp.ones((batch, 42, 1), jnp.float32)
    ones1 = jnp.ones((batch, 1), jnp.float32)
    return MLPBatch(
        hand_type_array=jnp.ones((batch, 2), jnp.float32),
        hand_type_valid=ones1,
        joints_2d=jnp.concatenate([d["gt_j2"], ones], axis=-1),
        joints_3d=jnp.concatenate([d["gt_j3"], ones], axis=-1),
        gt_pose_params=d["gt_pose"],
        gt_shape_params=d["gt_shape"],
        mano_params_weight=jnp.ones((batch, 2), jnp.float32),
        hand_trans=jnp.concatenate([d["gt_trans"], ones1], axis=-1)[:, None, :],
        img_feat=jnp.asarray(np.abs(rng.randn(batch, 1024)).astype(np.float32)),
        init_joints_2d=jnp.concatenate([d["init_j2"], ones], axis=-1),
        init_joints_3d=jnp.concatenate([d["init_j3"], ones], axis=-1),
        init_cam=d["init_cam"],
        init_pose_params=d["init_pose"],
        init_shape_params=d["init_shape"],
        init_hand_trans=d["init_trans"],
        index=jnp.arange(index_offset, index_offset + batch, dtype=jnp.int32),
    )
