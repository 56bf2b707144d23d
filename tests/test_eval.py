import numpy as np
import pytest

from ihmr_tpu.eval import Evaluator, ResultStat, metrics


def _make_results(B, rng, coll_scale=0.001):
    j3 = rng.randn(B, 42, 3).astype(np.float32)
    gt = np.concatenate([j3 + 0.01, np.ones((B, 42, 1), np.float32)], axis=2)
    return {
        "pred_cam_params": rng.randn(B, 3).astype(np.float32),
        "pred_shape_params": rng.randn(B, 20).astype(np.float32),
        "pred_pose_params": rng.randn(B, 96).astype(np.float32),
        "pred_hand_trans": rng.randn(B, 3).astype(np.float32),
        "pred_joints_3d": j3,
        "gt_joints_3d": gt,
        "collision_loss_origin_scale": np.abs(rng.randn(B, 1556)).astype(np.float32) * coll_scale,
        "pred_right_hand_verts": rng.randn(B, 778, 3).astype(np.float32),
        "pred_left_hand_verts": rng.randn(B, 778, 3).astype(np.float32),
        "gt_right_hand_verts": rng.randn(B, 778, 3).astype(np.float32),
        "gt_left_hand_verts": rng.randn(B, 778, 3).astype(np.float32),
        "do_flip": np.zeros(B, np.int32),
    }


class TestMetrics:
    def test_single_joints_error_zero(self):
        j = np.random.RandomState(0).randn(42, 3)
        errs = metrics.single_joints_error(j, j, np.ones((42, 1)), 1.0)
        assert len(errs) == 42
        np.testing.assert_allclose(errs, 0.0)

    def test_single_joints_error_scale(self):
        j = np.zeros((42, 3))
        j2 = j.copy()
        j2[1] = [3.0, 0, 0]  # one joint off by 3 (after root alignment)
        errs = metrics.single_joints_error(j2, j, np.ones((42, 1)), scale_factor=3.0)
        assert max(errs) == pytest.approx(1.0)

    def test_pa_error_invariant_to_translation_scale(self):
        rng = np.random.RandomState(1)
        gt = rng.randn(42, 3)
        pred = gt * 2.0 + 1.0
        errs = metrics.single_pa_inter_joints_error(pred, gt, np.ones(42), 1.0, use_rot=False)
        np.testing.assert_allclose(errs, 0.0, atol=1e-8)

    def test_pa_error_too_few_valid(self):
        gt = np.zeros((42, 3))
        valid = np.zeros(42)
        valid[0] = 1
        assert metrics.single_pa_inter_joints_error(gt, gt, valid, 1.0, False) == []

    def test_collision_auc_range(self):
        assert metrics.collision_auc(np.zeros(100)) == pytest.approx(1.0)
        assert metrics.collision_auc(np.full(100, 100.0)) == pytest.approx(0.0)


class TestEvaluator:
    def test_update_and_metrics(self):
        rng = np.random.RandomState(0)
        data_list = [{"img_path": f"img_{i}.png", "hand_type": "interacting"} for i in range(8)]
        ev = Evaluator(data_list)
        res = _make_results(4, rng)
        ev.update(np.arange(4), res)
        assert len(ev.pred_results) == 4
        assert np.isfinite(ev.mpjpe_3d)
        assert np.isfinite(ev.inter_mpjpe_3d)
        assert ev.collision_ave > 0
        assert ev.collision_max > ev.collision_ave

    def test_remove_redunc(self):
        rng = np.random.RandomState(1)
        data_list = [{"img_path": "same.png"}, {"img_path": "same.png"}, {"img_path": "other.png"}]
        ev = Evaluator(data_list)
        ev.update(np.asarray([0, 1, 2]), _make_results(3, rng))
        ev.remove_redunc()
        assert len(ev.pred_results) == 2

    def test_flip_back_roundtrip(self):
        """Flipping a sample twice must restore it."""
        rng = np.random.RandomState(2)
        data_list = [{"img_path": "a.png"}]
        res = _make_results(1, rng)
        ev = Evaluator(data_list)
        ev.update([0], res)
        orig = {
            k: ev.pred_results[0][k].copy()
            for k in ("pred_pose_params", "pred_joints_3d", "collision_loss_origin_scale")
        }
        ev._flip_back(ev.pred_results[0])
        # pose halves swapped
        assert not np.allclose(ev.pred_results[0]["pred_pose_params"], orig["pred_pose_params"])
        ev._flip_back(ev.pred_results[0])
        for k, v in orig.items():
            np.testing.assert_allclose(ev.pred_results[0][k], v, atol=1e-6)

    def test_non_interacting_excluded_from_collision(self):
        rng = np.random.RandomState(3)
        data_list = [
            {"img_path": "a.png", "hand_type": "right"},
            {"img_path": "b.png", "hand_type": "interacting"},
        ]
        ev = Evaluator(data_list)
        res = _make_results(2, rng, coll_scale=0.01)
        ev.update([0, 1], res)
        expected = float(np.mean(res["collision_loss_origin_scale"][1])) * 1000
        assert ev.collision_ave == pytest.approx(expected, rel=1e-5)

    def test_export_objs(self, tmp_path):
        rng = np.random.RandomState(4)
        faces = np.asarray([[0, 1, 2]])
        ev = Evaluator([{"img_path": "x/y.png"}], right_faces=faces, left_faces=faces)
        ev.update([0], _make_results(1, rng))
        ev.export_objs(str(tmp_path))
        objs = list(tmp_path.glob("*.obj"))
        assert len(objs) == 1


class TestResultStat:
    def test_best_tracking(self, capsys):
        rs = ResultStat()
        rs.update("mpjpe_3d", 1, 5.0)
        rs.update("inter_mpjpe_3d", 1, 5.0)
        rs.update("collision_ave", 1, 5.0)
        rs.update("collision_max", 1, 5.0)
        assert rs.achieve_better()
        rs.update("inter_mpjpe_3d", 2, 6.0)  # worse
        assert not rs.achieve_better()
        rs.update("inter_mpjpe_3d", 3, 4.0)  # better
        assert rs.achieve_better()
        assert rs.best_results["inter_mpjpe_3d"] == (4.0, 3)
        rs.print_current_result(3)
        rs.print_best_results()
        out = capsys.readouterr().out
        assert "inter_mpjpe_3d : 4.000" in out
