import numpy as np
import pytest

from ihmr_tpu.eval import Evaluator
from ihmr_tpu.parallel import dist
from ihmr_tpu.utils.train_visuals import make_training_visuals
from tests.test_eval import _make_results


class TestTrainVisuals:
    def test_panels(self):
        rng = np.random.RandomState(0)
        img = rng.rand(64, 64, 3).astype(np.float32) * 2 - 1
        faces = np.asarray([[0, 1, 2], [1, 2, 3]])
        verts = rng.randn(778, 3).astype(np.float32) * 0.05
        visuals = make_training_visuals(
            img,
            np.concatenate([rng.rand(42, 2) * 2 - 1, np.ones((42, 1))], 1).astype(np.float32),
            (rng.rand(42, 2) * 2 - 1).astype(np.float32),
            np.asarray([5.0, 0, 0], np.float32),
            verts, verts, verts, verts,
            faces, faces,
            input_size=64,
        )
        assert set(visuals) == {
            "img",
            "gt_render_img (separate)",
            "pred_render_img (separate)",
            "render together (gt / pred)",
            "keypoint (gt / pred)",
        }
        for name, panel in visuals.items():
            assert panel.dtype == np.uint8, name
            assert panel.shape[0] == 64 and panel.shape[1] == 128, (name, panel.shape)


class TestEvaluatorRender:
    def test_render_results_blank_canvas(self, tmp_path):
        rng = np.random.RandomState(1)
        faces = np.asarray([[0, 1, 2]])
        ev = Evaluator(
            [{"img_path": "nonexistent/x.png"}],
            right_faces=faces,
            left_faces=faces,
            input_size=32,
        )
        ev.update([0], _make_results(1, rng))
        ev.render_results(str(tmp_path))
        jpgs = list(tmp_path.glob("*.jpg"))
        assert len(jpgs) == 1


class TestDist:
    def test_single_process_init(self):
        rank, world = dist.initialize()
        assert world >= 1
        dist.barrier()  # no-op single process

    def test_gather_evaluators_single(self, tmp_path):
        rng = np.random.RandomState(2)
        ev = Evaluator([{"img_path": "a.png"}])
        ev.update([0], _make_results(1, rng))
        merged = dist.gather_evaluators(ev, str(tmp_path), "test", rank=0, world_size=1)
        assert merged is not None
        assert len(merged.pred_results) == 1
