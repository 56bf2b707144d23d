import numpy as np
import pytest

from ihmr_tpu.mano import synthetic_mano_model
from ihmr_tpu.utils import vis
from ihmr_tpu.utils.visualizer import Visualizer, save_vis_result


class TestRasterizer:
    def test_recover_img_roundtrip(self):
        rng = np.random.RandomState(0)
        img = rng.rand(8, 8, 3).astype(np.float32) * 2 - 1
        out = vis.recover_img(img)
        assert out.dtype == np.uint8
        np.testing.assert_allclose(out / 255.0, (img + 1) / 2, atol=0.01)

    def test_render_mesh_visible(self):
        model = synthetic_mano_model()
        verts = np.asarray(model.v_template)
        cam = np.asarray([5.0, 0.0, 0.0])
        img = vis.render_mesh_to_image(224, None, cam, verts, model.faces)
        assert img.shape == (224, 224, 3)
        assert (img > 0).mean() > 0.05  # the hand covers a chunk of the frame

    def test_zbuffer_order(self):
        """A nearer triangle must occlude a farther one."""
        # two overlapping triangles at different z (camera looks down -z in
        # our ortho convention: smaller z = closer)
        verts = np.asarray(
            [
                [-0.1, -0.1, 0.0], [0.1, -0.1, 0.0], [0.0, 0.1, 0.0],  # near
                [-0.1, -0.1, 1.0], [0.1, -0.1, 1.0], [0.0, 0.1, 1.0],  # far
            ],
            np.float32,
        )
        faces_near = np.asarray([[0, 1, 2]])
        faces_far = np.asarray([[3, 4, 5]])
        cam = np.asarray([5.0, 0.0, 0.0])
        img = vis.render_together(
            [verts[:3], verts[3:]],
            [faces_near, faces_far - 3],
            [vis.COLORS["red"], vis.COLORS["green"]],
            cam,
            64,
        )
        # center pixel should be red-ish (near triangle wins)
        c = img[32, 32].astype(float)
        assert c[0] > c[1], c

    def test_draw_keypoints(self):
        img = np.zeros((224, 224, 3), np.float32)
        kps = np.asarray([[0.0, 0.0], [0.5, 0.5]])
        w = np.asarray([[1.0], [0.0]])  # second kp invalid
        out = vis.draw_keypoints(img, kps, w, "red", 224)
        # valid kp drawn at center: red channel dominates the gray background
        assert out[112, 112, 0] > 200 and out[112, 112, 1] < 120
        # invalid kp not drawn: still the uniform gray background (127)
        assert out[168, 168, 0] == out[168, 168, 1] == out[168, 168, 2]


class TestVisualizer:
    def test_gallery_and_curves(self, tmp_path):
        v = Visualizer(str(tmp_path))
        visuals = {"img": np.zeros((32, 32, 3), np.uint8)}
        v.display_current_results(visuals, epoch=1, it=10)
        assert (tmp_path / "web" / "index.html").exists()
        assert len(list((tmp_path / "web" / "images").glob("*.png"))) == 1
        v.plot_current_errors(1.0, {"total_loss": 3.0})
        v.plot_current_errors(2.0, {"total_loss": 2.0})
        assert (tmp_path / "web" / "loss_curves.png").exists()

    def test_save_vis_result(self, tmp_path):
        visuals = {
            "a": np.zeros((32, 32, 3), np.uint8),
            "b": np.ones((64, 64, 3), np.uint8) * 255,
        }
        save_vis_result(visuals, str(tmp_path / "mid"), epoch=2, it=5)
        files = list((tmp_path / "mid").glob("*.png"))
        assert len(files) == 1
