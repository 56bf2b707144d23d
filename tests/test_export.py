import numpy as np

from ihmr_tpu.eval import Evaluator
from ihmr_tpu.eval.export import (
    evaluator_to_opt_pseudo_gt,
    evaluator_to_prediction_pkl,
    merge_opt_pseudo_gt_into_annotations,
)
from ihmr_tpu.utils import io_utils
from tests.test_eval import _make_results


def _filled_evaluator(n=3):
    rng = np.random.RandomState(0)
    data_list = [{"img_path": f"img_{i}.png"} for i in range(n)]
    ev = Evaluator(data_list)
    res = _make_results(n, rng)
    res["pred_joints_2d"] = rng.randn(n, 42, 2).astype(np.float32)
    ev.update(np.arange(n), res)
    return ev


def test_prediction_pkl_schema(tmp_path):
    ev = _filled_evaluator()
    path = str(tmp_path / "pred.pkl")
    out = evaluator_to_prediction_pkl(ev, path)
    loaded = io_utils.load_pkl(path)
    assert set(loaded) == {"img_0.png", "img_1.png", "img_2.png"}
    entry = loaded["img_0.png"]
    for key in (
        "pred_cam_params",
        "pred_shape_params",
        "pred_pose_params",
        "pred_hand_trans",
        "joints_2d",
        "joints_3d",
        "img_feat",
    ):
        assert key in entry, key
    assert entry["pred_pose_params"].shape == (96,)
    assert entry["img_feat"].shape == (1024,)
    assert entry["joints_2d"].shape[0] == 42


def test_prediction_pkl_feeds_opt_dataset(tmp_path):
    """The exported pkl must round-trip through OPTDataset."""
    import cv2

    from ihmr_tpu.data import DataConfig, OPTDataset

    ev = _filled_evaluator()
    root = str(tmp_path)
    io_utils.build_dir(root + "/hand26m/image")
    annos = []
    for i in range(3):
        cv2.imwrite(f"{root}/hand26m/image/img_{i}.png", np.zeros((64, 64, 3), np.uint8))
        annos.append(
            dict(
                img_path=f"img_{i}.png",
                hand_type="interacting",
                joints_2d=np.zeros((42, 2), np.float32),
                joints_3d=np.zeros((42, 3), np.float32),
            )
        )
    io_utils.save_pkl(f"{root}/anno.pkl", annos)
    evaluator_to_prediction_pkl(ev, f"{root}/pred.pkl")

    ds = OPTDataset(DataConfig(data_root=root, anno_path="anno.pkl", pred_path="pred.pkl", batch_size=3))
    ds.load_data()
    item = ds[0]
    assert item["init_pose_params"].shape == (96,)
    assert item["init_joints_3d"].shape == (42, 4)


def test_opt_pseudo_gt_merge(tmp_path):
    ev = _filled_evaluator()
    path = str(tmp_path / "pseudo.pkl")
    pseudo = evaluator_to_opt_pseudo_gt(ev, path)
    annos = [{"img_path": "img_1.png"}, {"img_path": "missing.png"}]
    merge_opt_pseudo_gt_into_annotations(annos, pseudo)
    assert "opt_pose_params" in annos[0]
    assert annos[0]["opt_pose_params"].shape == (96,)
    assert "opt_pose_params" not in annos[1]
