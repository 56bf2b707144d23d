"""Evaluator: per-sample result accumulation + the 4 headline metrics.

Port of ref src/utils/evaluator.py with the same accumulation contract:
``update(data_idxs, pred_results)`` ingests a batch of numpy results, computes
per-sample j3d / PA-no-rot errors immediately, un-flips mirrored samples
(:100-134), dedups the divisibility padding by image path (:137-146), and
exposes ``mpjpe_3d / inter_mpjpe_3d / collision_ave / collision_max``
(:149-181). Vertices are stored fp16 like the reference.

The reference's cross-rank gather is per-rank pickle files + a barrier
(ref src/test_baseline.py:67-78); here ranks simply pickle their Evaluator and
rank 0 merges with ``gather_pred`` — same mechanism, or use
``ihmr_tpu.parallel.gather_to_host`` to move it onto ICI.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, List, Optional, Sequence

import numpy as np

from ihmr_tpu.eval import metrics as mu
from ihmr_tpu.utils import io_utils


class Evaluator:
    def __init__(
        self,
        data_list: Sequence[dict],
        image_root: str = "",
        dataset_name: str = "synthetic",
        input_size: int = 224,
        right_faces: Optional[np.ndarray] = None,
        left_faces: Optional[np.ndarray] = None,
    ):
        self.dataset_name = dataset_name
        self.data_list = list(data_list)
        self.image_root = image_root
        self.input_size = input_size
        self.right_faces = right_faces
        self.left_faces = left_faces
        self.pred_results: List[dict] = []

    def clear(self):
        self.pred_results = []

    def gather_pred(self, pred_results: List[dict]):
        self.pred_results += pred_results

    # ------------------------------------------------------------------
    def update(self, data_idxs: Sequence[int], pred_results: Dict[str, np.ndarray], save_verts: bool = True):
        self.save_verts = save_verts
        for i, data_idx in enumerate(np.asarray(data_idxs)):
            data_idx = int(data_idx)
            anno = self.data_list[data_idx] if data_idx < len(self.data_list) else {}
            img_path_rel = anno.get("img_path", f"sample_{data_idx:08d}")
            # np.array(copy=True): results may be read-only views of device
            # arrays, and flip-back mutates in place
            single = dict(
                data_idx=data_idx,
                pred_cam_params=np.array(pred_results["pred_cam_params"][i]),
                pred_shape_params=np.array(pred_results["pred_shape_params"][i]),
                pred_pose_params=np.array(pred_results["pred_pose_params"][i]),
                pred_hand_trans=np.array(pred_results["pred_hand_trans"][i]),
                pred_joints_3d=np.array(pred_results["pred_joints_3d"][i]),
                collision_loss_origin_scale=np.array(
                    pred_results["collision_loss_origin_scale"][i]
                ),
                gt_joints_3d=np.array(pred_results["gt_joints_3d"][i]),
                img_path=io_utils.osp.join(self.image_root, img_path_rel)
                if self.image_root
                else img_path_rel,
                img_path_relative=img_path_rel,
            )
            if "pred_joints_2d" in pred_results:
                single["pred_joints_2d"] = np.array(pred_results["pred_joints_2d"][i])
            if "pred_hand_type" in pred_results:
                single["pred_hand_type"] = np.array(pred_results["pred_hand_type"][i])
            if pred_results.get("img_feat") is not None:
                single["img_feat"] = np.array(pred_results["img_feat"][i], np.float32)
            defaults = dict(
                annot_type="machine", hand_type="interacting", hand_type_valid=1.0, scale=1.0
            )
            for key, val in defaults.items():
                single[key] = anno.get(key, val)

            if save_verts:
                for mode in ("pred", "gt"):
                    for hand in ("left", "right"):
                        key = f"{mode}_{hand}_hand_verts"
                        if key in pred_results and pred_results[key] is not None:
                            single[key] = np.array(pred_results[key][i]).astype(np.float16)

            pred_j3 = single["pred_joints_3d"]
            gt_j3 = single["gt_joints_3d"][:, :3]
            valid = single["gt_joints_3d"][:, 3:]
            scale = single["scale"]
            single["j3d_error"] = mu.single_joints_error(pred_j3, gt_j3, valid, scale)
            single["pa_no_rot_inter_j3d_error"] = mu.single_pa_inter_joints_error(
                pred_j3, gt_j3, valid, scale, use_rot=False
            )
            if "pred_hand_type" in single:
                # computed here, pre flip-back: predictions for flipped
                # (left->right) samples live in the flipped frame, which is
                # what the reference's right-only check expects
                # (ref metric_utils.py:12-20)
                single["hand_type_acc"] = mu.hand_type_accuracy(
                    single["hand_type"], single["hand_type_valid"], single["pred_hand_type"]
                )

            if "do_flip" in pred_results and pred_results["do_flip"][i]:
                self._flip_back(single)
            self.pred_results.append(single)

    def _flip_back(self, single: dict):
        """Un-mirror a sample that was flipped left->right at load time
        (ref evaluator.py:100-134)."""
        single["pred_cam_params"][1] *= -1
        single["pred_hand_trans"][0] *= -1
        pose = single["pred_pose_params"].copy()
        single["pred_pose_params"][:48] = pose[48:]
        single["pred_pose_params"][48:] = pose[:48]
        single["pred_pose_params"][1::3] *= -1
        single["pred_pose_params"][2::3] *= -1
        for key in ("pred_joints_3d", "gt_joints_3d"):
            j = single[key].copy()
            single[key][:21] = j[21:]
            single[key][21:] = j[:21]
            single[key][:, 0] *= -1
        coll = single["collision_loss_origin_scale"].copy()
        half = coll.shape[0] // 2
        single["collision_loss_origin_scale"][:half] = coll[half:]
        single["collision_loss_origin_scale"][half:] = coll[:half]
        if self.save_verts:
            saved = {}
            for mode in ("pred", "gt"):
                for hand in ("left", "right"):
                    key = f"{mode}_{hand}_hand_verts"
                    if key in single:
                        saved[key] = single[key].copy()
            for mode in ("pred", "gt"):
                for hand in ("left", "right"):
                    other = "left" if hand == "right" else "right"
                    key = f"{mode}_{hand}_hand_verts"
                    key_flip = f"{mode}_{other}_hand_verts"
                    if key_flip in saved:
                        single[key] = saved[key_flip]
                        single[key][:, 0] *= -1

    def remove_redunc(self):
        """Drop the first-sample padding duplicates (ref :137-146)."""
        seen, out = set(), []
        for data in self.pred_results:
            if data["img_path_relative"] not in seen:
                out.append(data)
                seen.add(data["img_path_relative"])
        self.pred_results = out

    # ------------------------------------------------------------------
    @property
    def mpjpe_3d(self) -> float:
        errors: List[float] = []
        for pred in self.pred_results:
            errors += pred["j3d_error"]
        return float(np.average(errors)) if errors else float("nan")

    @property
    def inter_mpjpe_3d(self) -> float:
        errors: List[float] = []
        for pred in self.pred_results:
            errors += pred["pa_no_rot_inter_j3d_error"]
        return float(np.average(errors)) if errors else float("nan")

    @property
    def collision_ave(self) -> float:
        vals = [
            float(np.mean(p["collision_loss_origin_scale"])) * 1000
            for p in self.pred_results
            if p["hand_type"] == "interacting"
        ]
        return float(np.average(vals)) if vals else float("nan")

    @property
    def collision_max(self) -> float:
        vals = [
            float(np.max(p["collision_loss_origin_scale"])) * 1000
            for p in self.pred_results
            if p["hand_type"] == "interacting"
        ]
        return float(np.average(vals)) if vals else float("nan")

    @property
    def collision_auc(self) -> float:
        vals = [
            np.asarray(p["collision_loss_origin_scale"]) * 1000
            for p in self.pred_results
            if p["hand_type"] == "interacting"
        ]
        if not vals:
            return float("nan")
        return mu.collision_auc(np.concatenate(vals))

    @property
    def hand_type_acc(self) -> float:
        """Handedness classification accuracy (ref metric_utils.py:12-20;
        defined but never printed by the reference)."""
        flags: List[bool] = []
        for p in self.pred_results:
            flags += p.get("hand_type_acc", [])
        return float(np.mean(flags)) if flags else float("nan")

    def metric_dict(self) -> "OrderedDict[str, float]":
        md = OrderedDict(
            mpjpe_3d=self.mpjpe_3d,
            inter_mpjpe_3d=self.inter_mpjpe_3d,
            collision_ave=self.collision_ave,
            collision_max=self.collision_max,
            collision_auc=self.collision_auc,
        )
        acc = self.hand_type_acc
        if np.isfinite(acc):  # only baseline/MLP runs carry a handedness head
            md["hand_type_acc"] = acc
        return md

    # ------------------------------------------------------------------
    def render_results(
        self,
        res_vis_dir: str,
        limit: Optional[int] = None,
        size_type: str = "double",
        num_workers: int = 16,
    ):
        """Render predicted meshes over the source images to jpg
        (ref evaluator.py:231-275, OpenDR replaced by the numpy rasterizer).
        Missing image files render on a blank canvas.

        Fans the render out over ``num_workers`` processes, matching the
        reference's 16-way multiprocessing render (ref evaluator.py:262-275);
        pass ``num_workers=1`` (or render few results) for the serial path.
        The CPU rasterizer is pure numpy, so forked workers need no device."""
        io_utils.build_dir(res_vis_dir)
        size = self.input_size * 2 if size_type == "double" else self.input_size
        results = [
            r for r in self.pred_results[:limit] if "pred_right_hand_verts" in r
        ]
        faces_r = np.asarray(self.right_faces)
        faces_l = np.asarray(self.left_faces)
        tasks = [(r, faces_r, faces_l, size, res_vis_dir) for r in results]
        if num_workers > 1 and len(tasks) > 8:
            import multiprocessing as mp

            try:
                # fork: workers inherit loaded modules; the worker touches
                # only cv2 + the numpy rasterizer, never a device backend
                with mp.get_context("fork").Pool(processes=num_workers) as pool:
                    pool.map(_render_one_result, tasks, chunksize=4)
                return
            except (OSError, ValueError):
                pass  # restricted environments: fall through to serial
        for task in tasks:
            _render_one_result(task)


    def export_objs(self, res_obj_dir: str, limit: Optional[int] = None):
        """Dump predicted two-hand meshes as .obj (ref :231-275 without the
        OpenDR render)."""
        assert self.right_faces is not None and self.left_faces is not None
        for i, result in enumerate(self.pred_results[:limit]):
            if "pred_right_hand_verts" not in result:
                continue
            rv = np.asarray(result["pred_right_hand_verts"], np.float32)
            lv = np.asarray(result["pred_left_hand_verts"], np.float32)
            verts = np.concatenate([rv, lv], axis=0)
            faces = np.concatenate([self.right_faces, self.left_faces + rv.shape[0]], axis=0)
            name = result["img_path_relative"].replace("/", "_")
            name = name.rsplit(".", 1)[0] + ".obj"
            io_utils.save_mesh_to_obj(io_utils.osp.join(res_obj_dir, name), verts, faces)


def _render_one_result(task) -> None:
    """Render one prediction to jpg (module-level for multiprocessing)."""
    import cv2

    from ihmr_tpu.utils import vis

    result, faces_r, faces_l, size, res_vis_dir = task
    img = None
    if io_utils.osp.exists(result["img_path"]):
        ori = cv2.imread(result["img_path"])
        if ori is not None:
            h, w = ori.shape[:2]
            ratio = size / max(h, w)
            canvas = np.zeros((size, size, 3), np.uint8)
            rh, rw = int(h * ratio), int(w * ratio)
            canvas[:rh, :rw] = cv2.resize(ori, (rw, rh))
            img = canvas[..., ::-1]  # BGR -> RGB
    if img is None:
        img = np.zeros((size, size, 3), np.uint8)
    render = vis.render_together(
        [
            np.asarray(result["pred_right_hand_verts"], np.float32),
            np.asarray(result["pred_left_hand_verts"], np.float32),
        ],
        [faces_r, faces_l],
        [vis.COLORS["light_green"], vis.COLORS["light_blue"]],
        np.asarray(result["pred_cam_params"]),
        size,
        img,
    )
    out = np.concatenate([img, render], axis=0)
    name = result["img_path_relative"].replace("/", "_")
    name = name.rsplit(".", 1)[0] + ".jpg"
    cv2.imwrite(io_utils.osp.join(res_vis_dir, name), out[..., ::-1])
