"""Golden parity tests against the ACTUAL reference code at /root/reference.

Round 1 validated every numeric port against the builder's own NumPy
re-implementations — circular. These tests import the reference modules
directly (torch CPU is installed) and use them as the oracle:

  * transform_utils.batch_rodrigues / batch_orthogonal_project  (ref :23-54)
  * geometry_utils conversions + flip helpers                   (ref :32-49, 137-441)
  * rotate_utils rotation-augmentation math                     (ref :7-54)
  * metric_utils joint errors / Procrustes / AUC / handedness   (ref :12-160)
  * loss_utils — every non-SDF loss via a real LossUtil         (ref :41-171)
  * opt_utils gather/filter/select snapshot selection           (ref :70-153)
  * mlp_model.select_better_params accept/reject                (ref :592-637)
  * data_preprocess augmentation ops                            (ref :35-168)

The reference expects CUDA + several absent packages (sdf, ry_utils,
torchgeometry, torchvision, smplx, opendr); the fixture installs inert
stand-ins for those modules and patches ``.cuda()`` to the identity so the
reference code runs unmodified on CPU. Stubs never fabricate numerics — any
oracle value asserted here was computed by reference code.
"""

from __future__ import annotations

import contextlib
import random as _random_mod
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_SRC = "/root/reference/src"


# ---------------------------------------------------------------------------
# Harness: stub absent packages, neuter .cuda(), import reference modules.
# ---------------------------------------------------------------------------


def _stub_module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


class _StubSDFLoss:
    """Constructor-compatible stand-in so LossUtil can be built; the tests
    never call the SDF itself (collision parity is covered by
    tests/test_collision.py against brute force)."""

    def __init__(self, *a, **kw):
        pass

    def cuda(self):
        return self

    def __call__(self, *a, **kw):  # pragma: no cover - guard
        raise RuntimeError("SDF stub must not be invoked in parity tests")


class _StubColorJitter:
    def __init__(self, **kw):
        pass

    def __call__(self, img):  # pragma: no cover - guard
        raise RuntimeError("ColorJitter stub must not be invoked")


@pytest.fixture(scope="module")
def ref():
    """Import reference modules with stubs + identity .cuda(); yields a
    namespace of the imported modules; restores global patches after."""
    saved_modules = dict(sys.modules)
    saved_tensor_cuda = torch.Tensor.cuda
    saved_module_cuda = torch.nn.Module.cuda
    saved_cuda_device = torch.cuda.device

    stubs = {
        "sdf": _stub_module("sdf", SDFLoss=_StubSDFLoss, SDFLoss_Single=_StubSDFLoss),
        "ry_utils": _stub_module("ry_utils"),
        "torchgeometry": _stub_module("torchgeometry"),
        "torchvision": _stub_module("torchvision"),
        "torchvision.transforms": _stub_module(
            "torchvision.transforms", ColorJitter=_StubColorJitter
        ),
        "smplx": _stub_module("smplx"),
        "opendr": _stub_module("opendr"),
        "opendr.camera": _stub_module("opendr.camera", ProjectPoints=object),
        "opendr.renderer": _stub_module("opendr.renderer", ColoredRenderer=object),
        "opendr.lighting": _stub_module("opendr.lighting", LambertianPointLight=object),
    }
    stubs["torchvision"].transforms = stubs["torchvision.transforms"]
    stubs["opendr"].camera = stubs["opendr.camera"]
    stubs["opendr"].renderer = stubs["opendr.renderer"]
    stubs["opendr"].lighting = stubs["opendr.lighting"]
    sys.modules.update(stubs)

    torch.Tensor.cuda = lambda self, *a, **kw: self
    torch.nn.Module.cuda = lambda self, *a, **kw: self
    torch.cuda.device = lambda *a, **kw: contextlib.nullcontext()

    sys.path.insert(0, REF_SRC)
    try:
        import importlib

        ns = SimpleNamespace(
            transform_utils=importlib.import_module("models.transform_utils"),
            geometry_utils=importlib.import_module("utils.geometry_utils"),
            rotate_utils=importlib.import_module("utils.rotate_utils"),
            metric_utils=importlib.import_module("utils.metric_utils"),
            opt_utils=importlib.import_module("utils.opt_utils"),
            loss_utils=importlib.import_module("models.loss_utils"),
            data_preprocess=importlib.import_module("data.data_preprocess"),
            mlp_model=importlib.import_module("models.mlp_model"),
        )
        yield ns
    finally:
        sys.path.remove(REF_SRC)
        torch.Tensor.cuda = saved_tensor_cuda
        torch.nn.Module.cuda = saved_module_cuda
        torch.cuda.device = saved_cuda_device
        for name in list(sys.modules):
            # never evict torch internals: lazily-imported submodules
            # (torch._dynamo/_inductor via optimizer.step) hold C-level
            # TORCH_LIBRARY registrations that crash on re-import
            if name not in saved_modules and name != "torch" and not name.startswith("torch."):
                del sys.modules[name]


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def _n(x):
    return x.detach().cpu().numpy()


# ---------------------------------------------------------------------------
# transform_utils
# ---------------------------------------------------------------------------


def test_batch_rodrigues_parity(ref):
    from ihmr_tpu.core.rotations import axis_angle_to_matrix

    rng = np.random.default_rng(0)
    aa = rng.normal(size=(64, 3)).astype(np.float32)
    aa[0] = 0.0  # theta ~ 0 (the reference's +1e-8 quirk)
    aa[1] = [1e-6, -1e-6, 1e-6]
    aa[2] = [np.pi, 0, 0]

    want = _n(ref.transform_utils.batch_rodrigues(_t(aa)))
    got = np.asarray(axis_angle_to_matrix(aa))
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_batch_orthogonal_project_parity(ref):
    from ihmr_tpu.core.projection import orthographic_project

    rng = np.random.default_rng(1)
    X = rng.normal(size=(8, 42, 3)).astype(np.float32)
    cam = rng.normal(size=(8, 3)).astype(np.float32)

    want = _n(ref.transform_utils.batch_orthogonal_project(_t(X), _t(cam[:, None, :])))
    got = np.asarray(orthographic_project(X, cam))
    np.testing.assert_allclose(got, want, atol=1e-6)


# ---------------------------------------------------------------------------
# geometry_utils
# ---------------------------------------------------------------------------


def test_rotation_conversions_parity(ref):
    from ihmr_tpu.core.rotations import axis_angle_to_matrix, matrix_to_axis_angle

    gu = ref.geometry_utils
    rng = np.random.default_rng(2)
    aa = rng.normal(size=(32, 3)).astype(np.float32)
    aa[0] = 0.0
    aa[1] = [0.0, 3.0, 0.0]  # angle near pi

    # axis-angle -> rotation matrix (ref returns Nx4x4 homogeneous)
    want_m = _n(gu.angle_axis_to_rotation_matrix(_t(aa)))[:, :3, :3]
    got_m = np.asarray(axis_angle_to_matrix(aa))
    np.testing.assert_allclose(got_m, want_m, atol=2e-6)

    # rotation matrix -> axis-angle (ref consumes Nx3x4)
    m34 = np.concatenate([want_m, np.zeros((32, 3, 1), np.float32)], axis=2)
    want_aa = _n(gu.rotation_matrix_to_angle_axis(_t(m34)))
    got_aa = np.asarray(matrix_to_axis_angle(got_m))
    # compare as rotations (axis-angle has a sign/2pi gauge at angle ~ pi)
    np.testing.assert_allclose(
        np.asarray(axis_angle_to_matrix(got_aa)),
        _n(gu.angle_axis_to_rotation_matrix(_t(want_aa)))[:, :3, :3],
        atol=1e-4,
    )
    # away from the gauge boundary they must agree numerically
    np.testing.assert_allclose(got_aa[2:], want_aa[2:], atol=1e-4)


def test_flip_helpers_parity(ref):
    from ihmr_tpu.core.rotations import flip_hand_joints_3d, flip_hand_pose

    gu = ref.geometry_utils
    rng = np.random.default_rng(3)
    pose = rng.normal(size=(48,)).astype(np.float32)
    want = gu.flip_hand_pose(pose.copy())
    got = np.asarray(flip_hand_pose(pose))
    np.testing.assert_allclose(got, want.reshape(-1), atol=0)

    joints = rng.normal(size=(21, 3)).astype(np.float32)
    want_j = gu.flip_hand_joints_3d(joints.copy())
    got_j = np.asarray(flip_hand_joints_3d(joints))
    np.testing.assert_allclose(got_j, want_j, atol=1e-6)


def test_rotate_utils_parity(ref):
    from ihmr_tpu.core import rotations as rot
    from ihmr_tpu.data.preprocess import rotate_image

    ru = ref.rotate_utils
    rng = np.random.default_rng(4)

    img = rng.integers(0, 255, size=(64, 80, 3), dtype=np.uint8)
    for angle in (-90.0, -36.0, 0.0, 45.0):
        np.testing.assert_array_equal(rotate_image(img, angle), ru.rotate_image(img, angle))

    orient = rng.normal(size=(3,)).astype(np.float32)
    want_o = ru.rotate_orient(orient.copy(), 37.0)
    got_o = rot.rotate_orient_z(orient, 37.0)
    np.testing.assert_allclose(got_o, want_o, atol=1e-4)

    joints2 = rng.normal(size=(42, 2)).astype(np.float32) * 100
    origin = np.array([[32.0, 40.0]])
    want_2 = ru.rotate_joints_2d(joints2.copy(), origin, 25.0)
    got_2 = rot.rotate_joints_2d(joints2, origin, 25.0)
    np.testing.assert_allclose(got_2, want_2, atol=1e-3)

    joints3 = rng.normal(size=(42, 3)).astype(np.float32)
    want_3 = ru.rotate_joints_3d(joints3.T.copy(), 25.0)  # ref takes (3, N) and returns (N, 3)
    got_3 = rot.rotate_joints_3d(joints3, 25.0)
    np.testing.assert_allclose(got_3, want_3, atol=1e-5)


# ---------------------------------------------------------------------------
# metric_utils
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("valid_pattern", ["both", "right_only", "left_only", "none"])
def test_single_joints_error_parity(ref, valid_pattern):
    from ihmr_tpu.eval.metrics import single_joints_error

    rng = np.random.default_rng(5)
    j1 = rng.normal(size=(42, 3)).astype(np.float32)
    j2 = rng.normal(size=(42, 3)).astype(np.float32)
    w = np.ones((42, 1), np.float32)
    w[rng.integers(0, 42, size=6)] = 0.0  # some invalid joints
    if valid_pattern in ("left_only", "none"):
        w[0] = 0.0
    if valid_pattern in ("right_only", "none"):
        w[21] = 0.0

    want = ref.metric_utils.get_single_joints_error(j1.copy(), j2.copy(), w, 2.5)
    got = single_joints_error(j1, j2, w, 2.5)
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("use_rot", [True, False])
def test_pa_inter_joints_error_parity(ref, use_rot):
    from ihmr_tpu.eval.metrics import single_pa_inter_joints_error

    rng = np.random.default_rng(6)
    pred = rng.normal(size=(42, 3)).astype(np.float64)
    gt = rng.normal(size=(42, 3)).astype(np.float64)
    valid = (rng.random(42) > 0.2).astype(np.float32)

    want = ref.metric_utils.get_single_pa_inter_joints_error(
        pred.copy(), gt.copy(), valid.copy(), 1.7, use_rot
    )
    got = single_pa_inter_joints_error(pred, gt, valid, 1.7, use_rot)
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # the <2 valid joints early-out
    assert (
        single_pa_inter_joints_error(pred, gt, np.zeros(42), 1.0, use_rot)
        == ref.metric_utils.get_single_pa_inter_joints_error(
            pred, gt, np.zeros(42, np.float32), 1.0, use_rot
        )
        == []
    )


def test_procrustes_parity(ref):
    from ihmr_tpu.core.procrustes import no_rot_align, similarity_align

    rng = np.random.default_rng(7)
    S1 = rng.normal(size=(30, 3))
    S2 = rng.normal(size=(30, 3)) * 2.0 + 1.0
    np.testing.assert_allclose(
        similarity_align(S1.copy(), S2.copy()),
        ref.metric_utils.calc_transform(S1.copy(), S2.copy()),
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        no_rot_align(S1.copy(), S2.copy()),
        ref.metric_utils.calc_transform_no_rot(S1.copy(), S2.copy()),
        rtol=1e-9,
    )


def test_collision_auc_parity(ref):
    from ihmr_tpu.eval.metrics import collision_auc

    rng = np.random.default_rng(8)
    col = np.abs(rng.normal(size=500)) * 8.0
    assert collision_auc(col) == pytest.approx(ref.metric_utils.calc_collision_auc(col), rel=1e-9)


def test_hand_type_accuracy_parity(ref):
    from ihmr_tpu.eval.metrics import hand_type_accuracy

    cases = [
        ("interacting", 1.0, np.array([0.9, 0.8])),
        ("interacting", 1.0, np.array([0.9, 0.2])),
        ("right", 1.0, np.array([0.9, 0.2])),
        ("right", 1.0, np.array([0.9, 0.8])),
        ("right", 0.0, np.array([0.9, 0.2])),
    ]
    for ht, valid, pred in cases:
        want = ref.metric_utils.get_hand_type_acc(ht, valid, pred)
        got = hand_type_accuracy(ht, valid, pred)
        assert [bool(b) for b in want] == got


# ---------------------------------------------------------------------------
# loss_utils (via a real LossUtil instance; SDF stubbed, never called)
# ---------------------------------------------------------------------------

B = 6


@pytest.fixture(scope="module")
def loss_util(ref):
    opt = SimpleNamespace(
        inputSize=224,
        pose_params_dim=96,
        isTrain=True,
        use_hand_rotation=False,
        batchSize=B,
        sdf_robustifier=0.1,
    )
    mano_models = {
        "right": SimpleNamespace(faces=np.zeros((1538, 3), np.int64)),
        "left": SimpleNamespace(faces=np.zeros((1538, 3), np.int64)),
    }
    return ref.loss_utils.LossUtil(opt, mano_models)


def test_hand_type_loss_parity(loss_util):
    from ihmr_tpu.losses.losses import hand_type_loss

    rng = np.random.default_rng(10)
    gt = (rng.random((B, 2)) > 0.5).astype(np.float32)
    pred = rng.uniform(0.01, 0.99, size=(B, 2)).astype(np.float32)
    valid = (rng.random((B, 1)) > 0.3).astype(np.float32)

    want = float(loss_util._hand_type_loss(_t(gt), _t(pred), _t(valid)))
    got = float(hand_type_loss(gt, pred, valid))
    assert got == pytest.approx(want, rel=1e-5)


@pytest.mark.parametrize("dim", [45, 48])
def test_mano_pose_loss_parity(loss_util, dim):
    from ihmr_tpu.losses.losses import mano_pose_loss

    rng = np.random.default_rng(11)
    gt = rng.normal(size=(B, dim)).astype(np.float32)
    pred = rng.normal(size=(B, dim)).astype(np.float32)
    w = (rng.random((B, 1)) > 0.2).astype(np.float32)

    want = float(loss_util._mano_pose_loss(_t(gt), _t(pred), _t(w)))
    got = float(mano_pose_loss(gt, pred, w, use_hand_rotation=False))
    assert got == pytest.approx(want, rel=1e-4)


def test_mano_shape_loss_parity(loss_util):
    from ihmr_tpu.losses.losses import mano_shape_loss

    rng = np.random.default_rng(12)
    gt = rng.normal(size=(B, 10)).astype(np.float32)
    pred = rng.normal(size=(B, 10)).astype(np.float32)
    w = (rng.random((B, 1)) > 0.2).astype(np.float32)
    want = float(loss_util._mano_shape_loss(_t(gt), _t(pred), _t(w)))
    got = float(mano_shape_loss(gt, pred, w))
    assert got == pytest.approx(want, rel=1e-5)


def test_joints_2d_loss_parity(loss_util):
    from ihmr_tpu.losses.losses import joints_2d_loss

    rng = np.random.default_rng(13)
    gt = rng.normal(size=(B, 42, 2)).astype(np.float32)
    pred = rng.normal(size=(B, 42, 2)).astype(np.float32)
    w = (rng.random((B, 42, 1)) > 0.2).astype(np.float32)

    want, want_batch = loss_util._joints_2d_loss(_t(gt), _t(pred), _t(w))
    got, got_batch = joints_2d_loss(gt, pred, w)
    assert float(got) == pytest.approx(float(want), rel=1e-5)
    np.testing.assert_allclose(np.asarray(got_batch), _n(want_batch), rtol=1e-5)


@pytest.mark.parametrize("root_case", ["right", "left", "mid"])
def test_joints_3d_loss_parity(loss_util, root_case):
    """Covers the reference root-align quirk: right wrist weight > 0.5 aligns
    by right, < 1e-7 aligns by left, and the in-between band aligns by NEITHER
    (ref loss_utils.py:90-98)."""
    from ihmr_tpu.losses.losses import joints_3d_loss

    rng = np.random.default_rng(14)
    gt = rng.normal(size=(B, 42, 3)).astype(np.float32)
    pred = rng.normal(size=(B, 42, 3)).astype(np.float32)
    w = (rng.random((B, 42, 1)) > 0.2).astype(np.float32)
    w[:, 0, 0] = {"right": 1.0, "left": 0.0, "mid": 0.3}[root_case]

    want, want_batch = loss_util._joints_3d_loss(_t(gt).clone(), _t(pred).clone(), _t(w))
    got, got_batch = joints_3d_loss(gt, pred, w)
    assert float(got) == pytest.approx(float(want), rel=1e-4)
    np.testing.assert_allclose(np.asarray(got_batch), _n(want_batch), rtol=1e-4, atol=1e-7)


def test_hand_trans_loss_parity(loss_util):
    from ihmr_tpu.losses.losses import hand_trans_loss

    rng = np.random.default_rng(15)
    gt = rng.normal(size=(B, 1, 3)).astype(np.float32)
    pred = rng.normal(size=(B, 1, 3)).astype(np.float32)
    w = (rng.random((B, 1, 1)) > 0.2).astype(np.float32)
    want = float(loss_util._hand_trans_loss(_t(gt), _t(pred), _t(w)))
    got = float(hand_trans_loss(gt, pred, w))
    assert got == pytest.approx(want, rel=1e-5)


def test_shape_reg_loss_parity(loss_util):
    from ihmr_tpu.losses.losses import shape_reg_loss

    rng = np.random.default_rng(16)
    shape = rng.normal(size=(B, 20)).astype(np.float32)
    want = float(loss_util._shape_reg_loss(_t(shape)))
    got, _ = shape_reg_loss(shape)
    assert float(got) == pytest.approx(want, rel=1e-5)


def test_shape_residual_loss_parity(loss_util):
    from ihmr_tpu.losses.losses import shape_residual_loss

    rng = np.random.default_rng(17)
    pred = rng.normal(size=(B, 20)).astype(np.float32)
    init = rng.normal(size=(B, 20)).astype(np.float32)
    want = float(loss_util._shape_residual_loss(_t(pred), _t(init)))
    got = float(shape_residual_loss(pred, init))
    assert got == pytest.approx(want, rel=1e-5)


def test_finger_reg_loss_parity(loss_util):
    from ihmr_tpu.losses.losses import finger_reg_loss

    rng = np.random.default_rng(18)
    joints = rng.normal(size=(B, 42, 3)).astype(np.float32)
    want, want_batch = loss_util._finger_reg_loss(_t(joints))
    got, got_batch = finger_reg_loss(joints)
    assert float(got) == pytest.approx(float(want), rel=1e-4)
    np.testing.assert_allclose(np.asarray(got_batch), _n(want_batch), rtol=1e-4)


# ---------------------------------------------------------------------------
# opt_utils snapshot gather/filter/select vs the running-best recurrence the
# fused OPT engine uses (ihmr_tpu/refine/opt_engine.py run_stage/step).
# ---------------------------------------------------------------------------


def _running_best(losses_by_snap, params_by_snap, filter_loss, select_loss):
    """The exact recurrence opt_engine.run_stage computes in its scan:
    snapshot 0 is the initial best; snapshot i>0 replaces it iff all filter
    losses are <= origin*(1+(pct+0.1)/100) AND its select loss is strictly
    below the best so far."""
    origin = {n: losses_by_snap[n][0] for n, _ in filter_loss}
    bars = {n: origin[n] * (1.0 + (float(p) + 0.1) / 100.0) for n, p in filter_loss}
    best_select = losses_by_snap[select_loss][0].copy()
    best_params = {k: v[0].copy() for k, v in params_by_snap.items()}
    num_snap = next(iter(losses_by_snap.values())).shape[0]
    for i in range(1, num_snap):
        valid = np.ones(best_select.shape, bool)
        for n, _ in filter_loss:
            valid &= losses_by_snap[n][i] <= bars[n]
        improve = valid & (losses_by_snap[select_loss][i] < best_select)
        best_select = np.where(improve, losses_by_snap[select_loss][i], best_select)
        for k in best_params:
            best_params[k] = np.where(improve[:, None], params_by_snap[k][i], best_params[k])
    return best_params


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_opt_snapshot_selection_parity(ref, seed):
    rng = np.random.default_rng(100 + seed)
    bs, num_snap = 16, 9
    stage = {
        "update_params": ["pred_hand_trans", "pred_pose_params"],
        "filter_loss": [["joints_3d_loss_p", "+0"], ["collision_loss", "-10"]],
        "select_loss": "joints_3d_loss_p",
    }

    params_by_snap = {
        "pred_hand_trans": rng.normal(size=(num_snap, bs, 3)).astype(np.float32),
        "pred_pose_params": rng.normal(size=(num_snap, bs, 96)).astype(np.float32),
    }
    losses_by_snap = {
        "joints_3d_loss_p": rng.uniform(0.1, 2.0, size=(num_snap, bs)).astype(np.float32),
        "collision_loss": rng.uniform(0.0, 1.0, size=(num_snap, bs)).astype(np.float32),
    }
    # force exact select-loss ties so first-min semantics are exercised
    losses_by_snap["joints_3d_loss_p"][5] = losses_by_snap["joints_3d_loss_p"][3]
    # force samples where NO snapshot passes the -10% collision filter
    losses_by_snap["collision_loss"][1:, :4] = 5.0

    mid_results = []
    for i in range(num_snap):
        entry = {k: _t(v[i]) for k, v in params_by_snap.items()}
        entry.update({k: _t(v[i]) for k, v in losses_by_snap.items()})
        mid_results.append(entry)

    all_params, all_losses = ref.opt_utils.gather_params_losses(mid_results, stage)
    all_losses = ref.opt_utils.filter_by_losses(all_losses, stage["filter_loss"])
    want = ref.opt_utils.select_params(all_params, all_losses, stage["select_loss"])

    got = _running_best(losses_by_snap, params_by_snap, stage["filter_loss"], stage["select_loss"])
    for name in stage["update_params"]:
        np.testing.assert_allclose(got[name], _n(want[name]), atol=0)


def test_check_valid_loss_matches_schedule_guard(ref):
    """The reference bans GT-based losses from filter/select; our schedules
    must only use losses the reference considers valid."""
    from ihmr_tpu.refine.schedule import mlp_default, opt_default

    for strategy in (opt_default, mlp_default):
        for stage in strategy:
            for name, _pct in stage.filter_loss:
                assert ref.opt_utils.check_valid_loss(name), name
            assert ref.opt_utils.check_valid_loss(stage.select_loss)


# ---------------------------------------------------------------------------
# mlp_model.select_better_params accept/reject vs our mlp_engine
# ---------------------------------------------------------------------------


def test_mlp_select_better_params_parity(ref):
    import jax.numpy as jnp

    from ihmr_tpu.refine.mlp_engine import select_better_params
    from ihmr_tpu.refine.schedule import Stage

    rng = np.random.default_rng(200)
    bs, N = 12, 40  # batch within a dataset-sized cache of N
    data_idxs = torch.arange(10, 10 + bs)

    loss_names = ["joints_3d_loss_p", "collision_loss", "joints_2d_loss_p"]
    filter_loss = [["joints_3d_loss_p", "+0"], ["collision_loss", "+0"]]
    select_loss = "collision_loss"
    update_params = ["pred_hand_trans", "pred_shape_params"]

    # build a bare reference MLPModel exposing just what the method touches
    m = ref.mlp_model.MLPModel.__new__(ref.mlp_model.MLPModel)
    m.strategy = [
        {
            "update_params": update_params,
            "filter_loss": filter_loss,
            "select_loss": select_loss,
        }
    ]
    m.batch_size = bs
    m.data_idxs = data_idxs
    m.update_loss_name_list = loss_names
    m.data_idxs_all = torch.zeros(N, dtype=torch.long)
    m._MLPModel__gather_params = lambda: None

    cur_losses = {n: rng.uniform(0.1, 2.0, size=bs).astype(np.float32) for n in loss_names}
    prev_losses_full = {n: rng.uniform(0.1, 2.0, size=N).astype(np.float32) for n in loss_names}
    # exact ties on the select loss: ref accepts on '<=', so must we
    cur_losses[select_loss][:3] = prev_losses_full[select_loss][10:13]

    cur_params = {
        "pred_hand_trans": rng.normal(size=(bs, 3)).astype(np.float32),
        "pred_shape_params": rng.normal(size=(bs, 20)).astype(np.float32),
    }
    prev_params_full = {
        "prev_hand_trans": rng.normal(size=(N, 3)).astype(np.float32),
        "prev_shape_params": rng.normal(size=(N, 20)).astype(np.float32),
    }

    m.prev_losses = {f"prev_{n}_batch": _t(v) for n, v in prev_losses_full.items()}
    m.prev_params = {k: _t(v) for k, v in prev_params_full.items()}
    for n, v in cur_losses.items():
        setattr(m, f"{n}_batch", _t(v).clone())
    for n, v in cur_params.items():
        setattr(m, n, _t(v).clone())

    m.select_better_params(0)
    want_params = {n: _n(getattr(m, n)) for n in update_params}
    want_losses = {n: _n(getattr(m, f"{n}_batch")) for n in loss_names}

    # ours: group-structured params (trans; shapes split into right/left 10s)
    # and '*_batch'-keyed loss dicts
    stage = Stage(
        update_params=("trans", "right_shape", "left_shape"),
        loss_weights=(),
        lr=1e-2,
        epoch=1,
        filter_loss=tuple((n, p) for n, p in filter_loss),
        select_loss=select_loss,
    )
    sel = slice(10, 10 + bs)

    def to_groups(trans, shapes):
        return {
            "trans": jnp.asarray(trans),
            "right_shape": jnp.asarray(shapes[:, :10]),
            "left_shape": jnp.asarray(shapes[:, 10:]),
        }

    got_params, got_losses = select_better_params(
        stage,
        to_groups(cur_params["pred_hand_trans"], cur_params["pred_shape_params"]),
        {f"{n}_batch": jnp.asarray(v) for n, v in cur_losses.items()},
        to_groups(prev_params_full["prev_hand_trans"][sel], prev_params_full["prev_shape_params"][sel]),
        {f"{n}_batch": jnp.asarray(v[sel]) for n, v in prev_losses_full.items()},
    )
    np.testing.assert_allclose(
        np.asarray(got_params["trans"]), want_params["pred_hand_trans"], atol=0
    )
    np.testing.assert_allclose(
        np.concatenate(
            [np.asarray(got_params["right_shape"]), np.asarray(got_params["left_shape"])], axis=1
        ),
        want_params["pred_shape_params"],
        atol=0,
    )
    for n in loss_names:
        np.testing.assert_allclose(np.asarray(got_losses[f"{n}_batch"]), want_losses[n], atol=0)


# ---------------------------------------------------------------------------
# data_preprocess augmentation ops
# ---------------------------------------------------------------------------


class _ScriptedRandom:
    """Deterministic stand-in fed to BOTH implementations: returns scripted
    values for random()/randint() in call order."""

    def __init__(self, randoms=(), randints=()):
        self._randoms = list(randoms)
        self._randints = list(randints)

    def random(self):
        return self._randoms.pop(0)

    def randint(self, a, b):
        lo, hi = self._randints.pop(0)
        assert (lo, hi) == (a, b), f"randint bounds diverged: {(a, b)} vs {(lo, hi)}"
        return lo + (hi - lo) // 3  # arbitrary deterministic pick within bounds


@pytest.fixture()
def ref_processor(ref):
    opt = SimpleNamespace(inputSize=224, model_type="opt", isTrain=False, use_motion_blur=False)
    return ref.data_preprocess.DataProcessor(opt)


def test_hand_type_str2array_parity(ref_processor):
    from ihmr_tpu.data.preprocess import hand_type_str2array

    for ht in ("right", "left", "interacting"):
        np.testing.assert_array_equal(hand_type_str2array(ht), ref_processor.hand_type_str2array(ht))


@pytest.mark.parametrize("hw", [(100, 200), (200, 100), (224, 224), (50, 50)])
def test_padding_and_resize_parity(ref_processor, hw):
    from ihmr_tpu.data.preprocess import padding_and_resize

    rng = np.random.default_rng(30)
    img = rng.integers(0, 255, size=(*hw, 3), dtype=np.uint8)
    joints = (rng.random((42, 3)) * 100).astype(np.float32)

    want_img, want_j = ref_processor.padding_and_resize(img.copy(), joints.copy())
    got_img, got_j = padding_and_resize(img, joints, final_size=224)
    np.testing.assert_array_equal(got_img, want_img)
    np.testing.assert_allclose(got_j, want_j, rtol=1e-6)


def test_random_flip_parity(ref_processor):
    """Everything except betas: the reference builds mano_betas_new = zeros
    and forgets to fill it (ref data_preprocess.py:82,86-90), so flipped
    samples train with zeroed betas. We implement the intended swap; assert
    the reference really does return zeros so this documented divergence is
    pinned by a test."""
    from ihmr_tpu.data.preprocess import flip_sample

    rng = np.random.default_rng(31)
    img = rng.integers(0, 255, size=(224, 224, 3), dtype=np.uint8)
    hand_type = np.array([1.0, 0.0], np.float32)
    j2 = (rng.random((42, 3)) * 224).astype(np.float32)
    j3 = rng.normal(size=(42, 4)).astype(np.float32)
    pose = rng.normal(size=(96,)).astype(np.float32)
    betas = rng.normal(size=(20,)).astype(np.float32)
    weight = np.array([1.0, 0.0], np.float32)

    want = ref_processor.random_flip(
        img.copy(), hand_type.copy(), j2.copy(), j3.copy(),
        (pose.copy(), betas.copy(), weight.copy()), do_flip=True,
    )
    w_img, w_ht, w_j2, w_j3, (w_pose, w_betas, w_weight), flipped = want
    assert flipped

    g_img, g_ht, g_j2, g_j3, g_pose, g_betas, g_weight = flip_sample(
        img, hand_type, j2, j3, pose, betas, weight
    )
    np.testing.assert_array_equal(g_img, w_img)
    np.testing.assert_array_equal(g_ht, w_ht)
    np.testing.assert_allclose(g_j2, w_j2, atol=1e-6)
    np.testing.assert_allclose(g_j3, w_j3, atol=1e-6)
    np.testing.assert_allclose(g_pose, w_pose, atol=1e-6)
    np.testing.assert_array_equal(g_weight, w_weight)
    # the reference bug, pinned:
    np.testing.assert_array_equal(w_betas, np.zeros(20, np.float32))
    # our intended swap:
    np.testing.assert_array_equal(g_betas, np.concatenate([betas[10:], betas[:10]]))


@pytest.mark.parametrize("use_random_position", [False, True])
def test_random_rescale_parity(ref, ref_processor, use_random_position):
    from ihmr_tpu.data.preprocess import random_rescale

    rng = np.random.default_rng(32)
    img = rng.integers(0, 255, size=(224, 224, 3), dtype=np.uint8)
    joints = (rng.random((42, 3)) * 224).astype(np.float32)

    scale_draw = 0.42
    new_size = int(224 * (scale_draw * 0.4 + 0.6))
    end = 224 - new_size - 1
    scripted = lambda: _ScriptedRandom(  # noqa: E731
        randoms=[scale_draw], randints=[(0, end), (0, end)]
    )

    saved = ref.data_preprocess.random
    ref.data_preprocess.random = scripted()
    try:
        want_img, want_j = ref_processor.random_rescale(
            img.copy(), joints.copy(), use_random_position=use_random_position
        )
    finally:
        ref.data_preprocess.random = saved

    got_img, got_j = random_rescale(
        img, joints, scripted(), final_size=224, use_random_position=use_random_position
    )
    np.testing.assert_array_equal(got_img, want_img)
    np.testing.assert_allclose(got_j, want_j, rtol=1e-6)


def test_random_rotate_parity(ref, ref_processor):
    from ihmr_tpu.data.preprocess import random_rotate

    rng = np.random.default_rng(33)
    img = rng.integers(0, 255, size=(224, 224, 3), dtype=np.uint8)
    j2 = (rng.random((42, 3)) * 224).astype(np.float32)
    j3 = rng.normal(size=(42, 4)).astype(np.float32)
    pose = rng.normal(size=(96,)).astype(np.float32)

    scripted = lambda: _ScriptedRandom(randints=[(0, 9)])  # noqa: E731

    saved = ref.data_preprocess.random
    ref.data_preprocess.random = scripted()
    try:
        w_img, w_j2, w_j3, w_pose = ref_processor.random_rotate(
            img.copy(), j2.copy(), j3.copy(), pose.copy()
        )
    finally:
        ref.data_preprocess.random = saved

    g_img, g_j2, g_j3, g_pose = random_rotate(img, j2, j3, pose, scripted())
    np.testing.assert_array_equal(g_img, w_img)
    np.testing.assert_allclose(g_j2, w_j2, atol=1e-3)
    np.testing.assert_allclose(g_j3, w_j3, atol=1e-5)
    np.testing.assert_allclose(g_pose, w_pose, atol=1e-4)


def test_normalize_joints_2d_parity(ref_processor):
    from ihmr_tpu.data.preprocess import normalize_joints_2d

    rng = np.random.default_rng(34)
    joints = (rng.random((42, 3)) * 224).astype(np.float32)
    want = ref_processor.normalize_joints_2d(joints.copy())
    got = normalize_joints_2d(joints, final_size=224)
    np.testing.assert_allclose(got, want, rtol=1e-6)
