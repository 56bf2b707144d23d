"""Dataset item-assembly oracle: the reference's ACTUAL dataset classes
(``BaselineDataset``, ``MLPDataset``, ``OPTDataset``, torch CPU) and ours run
over the SAME on-disk fixture — annotation pkl + per-image param pkls +
prediction pkl + images, all in the reference schema — and every emitted
field is compared (VERDICT round-2 item 7: the last unverified link between
pixels and the verified engines).

Covered paths, with augmentation DISABLED (the augmentation ops themselves
are parity-tested in tests/test_ref_parity.py):
  * annotation pkl load + sort + per-image ``param_path`` merge
    (ref baseline_dataset.py:114-118)
  * hand-type 2-hot + validity; joints 2D/3D validity-column handling for
    BOTH raw layouts ((42,2)/(42,3) and pre-validated) (ref :126-157)
  * MANO pose(96)/betas(20)/weights(2) unpack incl. a None left hand
    (ref :164-182)
  * eval-time left-only -> flip-to-right (ref :71-74), letterbox + [-1,1]
    joint normalization, ToTensor+Normalize(.5,.5) image layout
  * GT inter-hand trans from joints with the validity gate (ref :192-199)
  * eval padding to batch divisibility (ref :57-64; see the documented
    deliberate deviation for the already-divisible case in
    ihmr_tpu/data/datasets.py)
  * annotation JOIN prediction pkl (ref data_utils.py:42-70), init params /
    joints / img_feat pass-through, init_hand_trans(_j) assembly
    (ref opt_dataset.py:147-153), and the OPT-pseudo-GT substitution with
    the REFERENCE key spelling (``pose_params_opt``/``shape_params_opt``/
    ``hand_trans_opt``; ref mlp_dataset.py:117-145)

torchvision is not installed in this image; the stub implements ToTensor /
Normalize / Compose with their exact documented semantics (uint8 HWC ->
float CHW /255; (x-mean)/std), which is all the reference datasets use.
"""

from __future__ import annotations

import pickle
import sys
from types import SimpleNamespace

import cv2
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # reference-oracle / full-schedule tests (fast tier: -m "not slow")

torch = pytest.importorskip("torch")

import test_ref_e2e_opt as e2e

REF_SRC = "/root/reference/src"
NUM_J = 42


# --------------------------------------------------------------------------
# faithful torchvision.transforms micro-stub (exact documented semantics)
class _ToTensor:
    def __call__(self, img):
        arr = np.asarray(img)
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 255.0
        return torch.from_numpy(np.ascontiguousarray(arr.transpose(2, 0, 1)))


class _Normalize:
    def __init__(self, mean, std):
        self.mean = torch.tensor(mean).view(-1, 1, 1)
        self.std = torch.tensor(std).view(-1, 1, 1)

    def __call__(self, t):
        return (t - self.mean) / self.std


class _Compose:
    def __init__(self, ts):
        self.ts = ts

    def __call__(self, x):
        for t in self.ts:
            x = t(x)
        return x


class _ColorJitter:
    def __init__(self, **kw):
        pass

    def __call__(self, img):  # pragma: no cover - aug is off in this oracle
        raise AssertionError("color jitter must not run with augmentation off")


def _load_pkl(path):
    with open(path, "rb") as f:
        return pickle.load(f)


# --------------------------------------------------------------------------
# shared on-disk fixture in the reference schema
@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    (root / "image").mkdir()
    (root / "param").mkdir()
    rng = np.random.RandomState(3)

    annos, preds = [], {}
    specs = [
        # (name, (h, w), hand_type, valid, j2_cols, j3_cols, left_param)
        ("a.png", (60, 44), "interacting", 1.0, 2, 3, True),
        ("b.png", (44, 60), "left", 1.0, 3, 4, True),  # flip-to-right path
        ("c.png", (64, 64), "right", 0.0, 2, 4, False),  # left param None
        ("d.png", (50, 70), "interacting", 1.0, 3, 3, True),
        ("e.png", (70, 50), "interacting", 1.0, 2, 4, True),
    ]
    for name, (h, w), ht, valid, j2c, j3c, left in specs:
        img = rng.randint(0, 255, size=(h, w, 3), dtype=np.uint8)
        cv2.imwrite(str(root / "image" / name), img)

        j2 = (rng.rand(NUM_J, j2c) * max(h, w)).astype(np.float32)
        if j2c == 3:
            j2[:, 2] = (rng.rand(NUM_J) > 0.3).astype(np.float32)
        j3 = (rng.randn(NUM_J, j3c) * 0.1).astype(np.float32)
        if j3c == 4:
            j3[:, 3] = (rng.rand(NUM_J) > 0.2).astype(np.float32)
            j3[0, 3] = 1.0  # keep the trans validity gate exercised both ways
            j3[21, 3] = 1.0 if name != "d.png" else 0.0

        param = dict(
            right_hand_param=dict(
                pose=rng.randn(48).astype(np.float32),
                shape=rng.randn(10).astype(np.float32),
            ),
            left_hand_param=(
                dict(
                    pose=rng.randn(48).astype(np.float32),
                    shape=rng.randn(10).astype(np.float32),
                )
                if left
                else None
            ),
        )
        with open(root / "param" / f"{name}.pkl", "wb") as f:
            pickle.dump(param, f)

        annos.append(
            dict(
                img_path=name,
                hand_type=ht,
                hand_type_valid=valid,
                joints_2d=j2,
                joints_3d=j3,
                scale=float(rng.uniform(0.8, 1.2)),
                param_path=f"{name}.pkl",
                # reference-spelled OPT pseudo-GT (ref mlp_dataset.py:124-143)
                pose_params_opt=rng.randn(96).astype(np.float32),
                shape_params_opt=rng.randn(20).astype(np.float32),
                hand_trans_opt=rng.randn(3).astype(np.float32),
            )
        )
        preds[name] = dict(
            pred_cam_params=rng.randn(3).astype(np.float32),
            pred_shape_params=rng.randn(20).astype(np.float32),
            pred_pose_params=rng.randn(96).astype(np.float32),
            pred_hand_trans=rng.randn(3).astype(np.float32),
            joints_2d=(rng.rand(NUM_J, 2) * 64).astype(np.float32),
            joints_3d=(rng.randn(NUM_J, 3) * 0.1).astype(np.float32),
            img_feat=np.abs(rng.randn(1024)).astype(np.float32),
        )

    with open(root / "anno.pkl", "wb") as f:
        pickle.dump(annos, f)
    with open(root / "pred.pkl", "wb") as f:
        pickle.dump(preds, f)
    return root


@pytest.fixture(scope="module")
def ref_env(fixture_dir):
    saved_modules = dict(sys.modules)
    saved_tensor_cuda = torch.Tensor.cuda
    saved_module_cuda = torch.nn.Module.cuda

    tv = e2e._stub_module("torchvision")
    tvt = e2e._stub_module(
        "torchvision.transforms",
        ToTensor=_ToTensor,
        Normalize=_Normalize,
        Compose=_Compose,
        ColorJitter=_ColorJitter,
    )
    tv.transforms = tvt
    stubs = {
        "sdf": e2e._stub_module("sdf", SDFLoss=e2e._ZeroSDF, SDFLoss_Single=e2e._ZeroSDF),
        "ry_utils": e2e._stub_module("ry_utils", load_pkl=_load_pkl),
        "torchgeometry": e2e._stub_module("torchgeometry"),
        "torchvision": tv,
        "torchvision.transforms": tvt,
        "smplx": e2e._stub_module("smplx"),
        "opendr": e2e._stub_module("opendr"),
        "opendr.camera": e2e._stub_module("opendr.camera", ProjectPoints=object),
        "opendr.renderer": e2e._stub_module("opendr.renderer", ColoredRenderer=object),
        "opendr.lighting": e2e._stub_module(
            "opendr.lighting", LambertianPointLight=object
        ),
    }
    sys.modules.update(stubs)
    torch.Tensor.cuda = lambda self, *a, **kw: self
    torch.nn.Module.cuda = lambda self, *a, **kw: self

    sys.path.insert(0, REF_SRC)
    try:
        import importlib

        yield SimpleNamespace(
            baseline_dataset=importlib.import_module("data.baseline_dataset"),
            mlp_dataset=importlib.import_module("data.mlp_dataset"),
            opt_dataset=importlib.import_module("data.opt_dataset"),
        )
    finally:
        sys.path.remove(REF_SRC)
        torch.Tensor.cuda = saved_tensor_cuda
        torch.nn.Module.cuda = saved_module_cuda
        for name in list(sys.modules):
            # never evict torch internals: lazily-imported submodules
            # (torch._dynamo/_inductor via optimizer.step) hold C-level
            # TORCH_LIBRARY registrations that crash on re-import
            if name not in saved_modules and name != "torch" and not name.startswith("torch."):
                del sys.modules[name]


def _ref_opt_ns(root, batch=2, use_opt_params=False):
    return SimpleNamespace(
        isTrain=False,
        dist=False,
        batchSize=batch,
        num_joints=NUM_J,
        inputSize=224,
        model_type="baseline",
        use_motion_blur=False,
        use_opt_params=use_opt_params,
        data_root=str(root),
        param_root=str(root / "param"),
    )


def _our_config(root, use_opt_params=False):
    from ihmr_tpu.data import DataConfig

    return DataConfig(
        data_root=str(root),
        param_root=str(root / "param"),
        image_root="image",
        anno_path="anno.pkl",
        pred_path="pred.pkl",
        batch_size=2,
        world_size=1,
        input_size=224,
        is_train=False,
        use_opt_params=use_opt_params,
    )


def _cmp(got, want, name, atol=1e-6):
    got = np.asarray(got)
    want = want.numpy() if hasattr(want, "numpy") else np.asarray(want)
    want = want.reshape(got.shape)
    np.testing.assert_allclose(got, want, atol=atol, rtol=0, err_msg=name)


_COMMON = (
    "joints_2d joints_3d mano_pose mano_betas mano_params_weight hand_trans "
    "hand_type_array hand_type_valid scale_ratio index"
).split()


def test_baseline_dataset_items_match(ref_env, fixture_dir):
    from ihmr_tpu.data import BaselineDataset

    ref = ref_env.baseline_dataset.BaselineDataset(
        _ref_opt_ns(fixture_dir), ("hand26m", "anno.pkl", "image")
    )
    ref.load_data()
    ours = BaselineDataset(_our_config(fixture_dir))
    ours.load_data()

    # 5 annos, batch 2 -> 1 padded duplicate on both sides
    assert len(ref) == len(ours) == 6
    assert ref.num_add == ours.num_add == 1

    for i in range(len(ours)):
        r, o = ref.getitem(i), ours.getitem(i)
        flipped = bool(int(o["do_flip"]))
        for k in _COMMON + ["do_flip"]:
            if k == "mano_betas" and flipped:
                # documented deliberate divergence: ref random_flip builds
                # mano_betas_new = zeros and forgets to fill it (ref
                # data_preprocess.py:82,86-90) — flipped samples train with
                # zeroed betas; we implement the evidently-intended swap
                # (pinned component-wise in test_ref_parity.py::
                # test_random_flip_parity). Assert the ref bug holds and our
                # value is a real swap, not zeros.
                assert np.all(np.asarray(r[k]) == 0.0), f"item {i} ref betas"
                assert np.abs(np.asarray(o[k])).max() > 0, f"item {i} our betas"
                continue
            _cmp(o[k], r[k], f"item {i} {k}")
        # image: ours HWC float [-1,1]; ref CHW via ToTensor+Normalize
        _cmp(np.transpose(o["img"], (2, 0, 1)), r["img"], f"item {i} img", atol=1e-5)
    # the flip path must actually have triggered (sample 'b' is left-only)
    flips = [int(ours.getitem(i)["do_flip"]) for i in range(len(ours))]
    assert sum(flips) >= 1


def test_opt_dataset_items_match(ref_env, fixture_dir):
    from ihmr_tpu.data import OPTDataset

    ref = ref_env.opt_dataset.OPTDataset(
        _ref_opt_ns(fixture_dir), ("hand26m", "anno.pkl", "pred.pkl", "image")
    )
    ref.load_data()
    ours = OPTDataset(_our_config(fixture_dir))
    ours.load_data()
    assert len(ref) == len(ours)

    fields = _COMMON[:-1] + [  # no 'index' in some ref variants? keep explicit
        "index",
        "init_cam",
        "init_shape_params",
        "init_pose_params",
        "init_hand_trans",
        "init_joints_2d",
        "init_joints_3d",
        "init_hand_trans_j",
    ]
    for i in range(len(ours)):
        r, o = ref.getitem(i), ours.getitem(i)
        for k in fields:
            _cmp(o[k], r[k], f"item {i} {k}")


def test_mlp_dataset_items_match(ref_env, fixture_dir):
    from ihmr_tpu.data import MLPDataset

    ref = ref_env.mlp_dataset.MLPDataset(
        _ref_opt_ns(fixture_dir), ("hand26m", "anno.pkl", "pred.pkl", "image")
    )
    ref.load_data()
    ours = MLPDataset(_our_config(fixture_dir))
    ours.load_data()
    assert len(ref) == len(ours)

    fields = _COMMON + [
        "init_cam",
        "init_shape_params",
        "init_pose_params",
        "init_joints_2d",
        "init_joints_3d",
        "img_feat",
    ]
    for i in range(len(ours)):
        r, o = ref.getitem(i), ours.getitem(i)
        for k in fields:
            _cmp(o[k], r[k], f"item {i} {k}")
        # ref MLP emits raw (3,) init trans; ours a (1,4) validity layout
        _cmp(np.asarray(o["init_hand_trans"])[0, :3], r["init_hand_trans"], f"item {i} init_hand_trans")
        # image may go through the fused native letterbox: small resize drift
        _cmp(np.transpose(o["img"], (2, 0, 1)), r["img"], f"item {i} img", atol=2e-2)


def test_mlp_dataset_opt_pseudo_gt_with_reference_keys(ref_env, fixture_dir):
    """use_opt_params=True: the reference substitutes pose_params_opt /
    shape_params_opt / hand_trans_opt for the MANO GT (ref mlp_dataset.py:
    117-145); ours must honor the reference's key spelling."""
    from ihmr_tpu.data import MLPDataset

    ref = ref_env.mlp_dataset.MLPDataset(
        _ref_opt_ns(fixture_dir, use_opt_params=True),
        ("hand26m", "anno.pkl", "pred.pkl", "image"),
    )
    ref.load_data()
    ours = MLPDataset(_our_config(fixture_dir, use_opt_params=True))
    ours.load_data()

    for i in range(len(ours)):
        r, o = ref.getitem(i), ours.getitem(i)
        for k in ("mano_pose", "mano_betas", "mano_params_weight", "hand_trans"):
            _cmp(o[k], r[k], f"item {i} {k}")
        # substitution actually happened: weights all-ones even for the
        # sample whose left_hand_param is None
        assert np.all(np.asarray(o["mano_params_weight"]) == 1.0)
