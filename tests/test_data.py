import os.path as osp

import cv2
import numpy as np
import pytest

from ihmr_tpu.data import (
    BaselineDataset,
    BatchLoader,
    DataConfig,
    MLPDataset,
    OPTDataset,
    load_annotation,
)
from ihmr_tpu.data import preprocess as pp
from ihmr_tpu.utils import io_utils


def _write_synthetic_corpus(root, n=6):
    """Annotation pkl + prediction pkl + images matching the reference schema."""
    rng = np.random.RandomState(0)
    img_dir = osp.join(root, "hand26m/image")
    io_utils.build_dir(img_dir)
    annos, preds = [], {}
    for i in range(n):
        img_path = f"img_{i:03d}.png"
        img = (rng.rand(120, 90, 3) * 255).astype(np.uint8)
        cv2.imwrite(osp.join(img_dir, img_path), img)
        hand_type = ["interacting", "right", "left"][i % 3]
        annos.append(
            dict(
                img_path=img_path,
                hand_type=hand_type,
                hand_type_valid=1.0,
                joints_2d=rng.rand(42, 2).astype(np.float32) * 90,
                joints_3d=rng.randn(42, 3).astype(np.float32) * 0.05,
                scale=1.0,
                right_hand_param=dict(pose=rng.randn(48) * 0.1, shape=rng.randn(10) * 0.3),
                left_hand_param=dict(pose=rng.randn(48) * 0.1, shape=rng.randn(10) * 0.3),
            )
        )
        preds[img_path] = dict(
            pred_cam_params=rng.randn(3).astype(np.float32),
            pred_shape_params=rng.randn(20).astype(np.float32),
            pred_pose_params=rng.randn(96).astype(np.float32) * 0.2,
            pred_hand_trans=rng.randn(3).astype(np.float32) * 0.02,
            joints_2d=rng.rand(42, 2).astype(np.float32) * 90,
            joints_3d=rng.randn(42, 3).astype(np.float32) * 0.05,
            img_feat=rng.rand(1024).astype(np.float32),
        )
    io_utils.save_pkl(osp.join(root, "anno.pkl"), annos)
    io_utils.save_pkl(osp.join(root, "pred.pkl"), preds)
    return annos, preds


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus"))
    annos, preds = _write_synthetic_corpus(root)
    return root, annos, preds


class TestPreprocess:
    def test_letterbox_keeps_aspect(self):
        img = np.zeros((100, 50, 3), np.uint8)
        img[:, :, 0] = 255
        joints = np.asarray([[50.0, 100.0, 1.0]] * 42, np.float32)
        out, j = pp.padding_and_resize(img, joints, 224)
        assert out.shape == (224, 224, 3)
        assert out[:, :112].any() and not out[:, 120:].any()  # right padding
        np.testing.assert_allclose(j[0, :2], [112, 224], atol=1.0)

    def test_flip_roundtrip(self):
        rng = np.random.RandomState(1)
        img = (rng.rand(224, 224, 3) * 255).astype(np.uint8)
        j2 = rng.rand(42, 3).astype(np.float32)
        j3 = rng.randn(42, 4).astype(np.float32)
        pose = rng.randn(96).astype(np.float32)
        betas = rng.randn(20).astype(np.float32)
        w = np.asarray([1.0, 0.0], np.float32)
        out = pp.flip_sample(img, np.asarray([1.0, 1.0], np.float32), j2, j3, pose, betas, w)
        img2, ht2, j2b, j3b, pose2, betas2, w2 = out
        # double flip restores everything except the x-pixel convention detail
        out2 = pp.flip_sample(img2, ht2, j2b, j3b, pose2, betas2, w2)
        np.testing.assert_allclose(out2[4], pose, atol=1e-6)  # pose restored
        np.testing.assert_allclose(out2[3], j3, atol=1e-6)  # joints3d restored
        np.testing.assert_allclose(out2[6], w, atol=1e-6)

    def test_normalize_joints(self):
        j = np.asarray([[0.0, 224.0, 1.0], [112.0, 112.0, 1.0]], np.float32)
        out = pp.normalize_joints_2d(j, 224)
        np.testing.assert_allclose(out[0, :2], [-1.0, 1.0])
        np.testing.assert_allclose(out[1, :2], [0.0, 0.0])

    def test_normalize_image_range(self):
        """Channel order is PRESERVED: the reference feeds cv2 BGR straight
        through ToTensor (ref baseline_dataset.py:41-44,123), so normalization
        must not reorder channels (round-3 dataset-oracle finding)."""
        img = np.zeros((4, 4, 3), np.uint8)
        img[..., 0] = 255  # blue in BGR
        out = pp.normalize_image(img)
        assert out.shape == (4, 4, 3)
        np.testing.assert_allclose(out[..., 0], 1.0)  # stays channel 0
        np.testing.assert_allclose(out[..., 2], -1.0)

    def test_rotate_consistency(self):
        """Rotating joints_2d and the image must keep them registered: a
        bright dot at the joint location lands where the joint maps to."""
        import random as pyrandom

        img = np.zeros((224, 224, 3), np.uint8)
        img[50:54, 150:154] = 255
        j2 = np.asarray([[152.0, 52.0, 1.0]] * 42, np.float32)
        j3 = np.random.RandomState(0).randn(42, 4).astype(np.float32)
        pose = np.zeros(96, np.float32)
        rng = pyrandom.Random(3)
        img_r, j2_r, _, _ = pp.random_rotate(img, j2, j3, pose, rng)
        y, x = np.argwhere(img_r[..., 0] > 100).mean(axis=0)
        assert abs(x - j2_r[0, 0]) < 3 and abs(y - j2_r[0, 1]) < 3


class TestDatasets:
    def test_baseline_item_schema(self, corpus):
        root, annos, _ = corpus
        cfg = DataConfig(data_root=root, anno_path="anno.pkl", batch_size=2, is_train=False)
        ds = BaselineDataset(cfg)
        ds.load_data()
        assert len(ds) % 2 == 0  # padded to batch divisibility
        item = ds[0]
        assert item["img"].shape == (224, 224, 3)
        assert item["joints_2d"].shape == (42, 3)
        assert item["joints_3d"].shape == (42, 4)
        assert item["mano_pose"].shape == (96,)
        assert item["hand_trans"].shape == (1, 4)
        assert np.abs(item["joints_2d"][:, :2]).max() <= 1.0 + 1e-5

    def test_left_only_flipped(self, corpus):
        root, annos, _ = corpus
        cfg = DataConfig(data_root=root, anno_path="anno.pkl", batch_size=1, is_train=False)
        ds = BaselineDataset(cfg)
        ds.load_data()
        left_idx = next(
            i for i, a in enumerate(ds.data_list) if a.get("hand_type") == "left"
        )
        item = ds[left_idx]
        assert item["do_flip"] == 1
        np.testing.assert_allclose(item["hand_type_array"], [1.0, 0.0])  # now right

    def test_mlp_dataset(self, corpus):
        root, _, _ = corpus
        cfg = DataConfig(
            data_root=root, anno_path="anno.pkl", pred_path="pred.pkl", batch_size=2
        )
        ds = MLPDataset(cfg)
        ds.load_data()
        item = ds[0]
        assert item["img_feat"].shape == (1024,)
        assert item["init_pose_params"].shape == (96,)
        assert item["init_joints_3d"].shape == (42, 4)
        assert item["init_hand_trans_j"].shape == (1, 4)
        assert "img" in item

    def test_opt_dataset_no_image(self, corpus):
        root, _, _ = corpus
        cfg = DataConfig(
            data_root=root, anno_path="anno.pkl", pred_path="pred.pkl", batch_size=2
        )
        ds = OPTDataset(cfg)
        ds.load_data()
        item = ds[0]
        assert "img" not in item and "img_feat" not in item
        assert item["init_cam"].shape == (3,)

    def test_load_annotation_from_dir(self, corpus):
        root, _, _ = corpus
        lst = load_annotation(root, "hand26m/image")
        assert len(lst) == 6
        assert all("img_path" in d for d in lst)


class TestLoader:
    def test_sharding_partitions(self, corpus):
        root, _, _ = corpus
        cfg = DataConfig(data_root=root, anno_path="anno.pkl", batch_size=2, world_size=1)
        ds = BaselineDataset(cfg)
        ds.load_data()
        seen = []
        for rank in range(2):
            loader = BatchLoader(ds, batch_size=2, rank=rank, world_size=2, prefetch=0)
            for batch in loader:
                seen += batch["index"].tolist()
        assert sorted(set(seen)) == list(range(len(ds)))

    def test_prefetch_equals_sync(self, corpus):
        root, _, _ = corpus
        cfg = DataConfig(data_root=root, anno_path="anno.pkl", batch_size=3)
        ds = BaselineDataset(cfg)
        ds.load_data()
        sync = [b["index"] for b in BatchLoader(ds, 3, prefetch=0)]
        pre = [b["index"] for b in BatchLoader(ds, 3, prefetch=2)]
        assert len(sync) == len(pre)
        for a, b in zip(sync, pre):
            np.testing.assert_array_equal(a, b)

    def test_shuffle_changes_with_epoch(self, corpus):
        root, _, _ = corpus
        cfg = DataConfig(data_root=root, anno_path="anno.pkl", batch_size=6)
        ds = BaselineDataset(cfg)
        ds.load_data()
        loader = BatchLoader(ds, 6, shuffle=True, prefetch=0)
        loader.set_epoch(0)
        e0 = [b["index"] for b in loader][0]
        loader.set_epoch(1)
        e1 = [b["index"] for b in loader][0]
        assert not np.array_equal(e0, e1)
