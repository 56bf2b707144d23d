"""Augmentation extras: motion blur (.mat PSF kernels), color jitter, and the
camera-stage strategy."""

import random as pyrandom

import numpy as np
import pytest
import scipy.io

from ihmr_tpu.data import preprocess as pp


class TestMotionBlur:
    def test_load_and_apply_kernels(self, tmp_path):
        # write PSF .mat files in the reference's schema ({'PSFs': [[kern]]};
        # ref data_utils.py:73-79)
        k = np.zeros((7, 7))
        k[3, :] = 1.0 / 7  # horizontal blur
        cell = np.empty((1, 1), dtype=object)  # a true MATLAB-style cell array
        cell[0, 0] = k
        scipy.io.savemat(str(tmp_path / "psf1.mat"), {"PSFs": cell})
        kernels = pp.load_blur_kernels(str(tmp_path))
        assert len(kernels) == 1
        np.testing.assert_allclose(kernels[0], k)

        rng = pyrandom.Random(0)
        img = np.zeros((32, 32, 3), np.uint8)
        img[16, 16] = 255
        out = pp.add_motion_blur(img, kernels, rng, prob=1.0)
        # the point has been smeared along the row
        assert out[16, 16, 0] < 255
        assert (out[16, 13:20, 0] > 0).sum() >= 5

    def test_prob_zero_is_identity(self, tmp_path):
        rng = pyrandom.Random(1)
        img = (np.random.RandomState(0).rand(16, 16, 3) * 255).astype(np.uint8)
        out = pp.add_motion_blur(img, [np.ones((3, 3)) / 9], rng, prob=0.0)
        np.testing.assert_array_equal(out, img)

    def test_missing_dir_ok(self):
        assert pp.load_blur_kernels("/nonexistent/dir") == []


class TestColorJitter:
    def test_changes_pixels_keeps_shape(self):
        rng = pyrandom.Random(2)
        img = (np.random.RandomState(1).rand(32, 32, 3) * 200 + 20).astype(np.uint8)
        out = pp.color_jitter(img, rng)
        assert out.shape == img.shape and out.dtype == np.uint8
        assert np.abs(out.astype(int) - img.astype(int)).mean() > 1


class TestCamStrategy:
    def test_opt_with_cam_registered(self):
        from ihmr_tpu.refine import strategies

        s = strategies["opt_with_cam"]
        assert len(s) == 5
        assert s[4].update_params == ("cam",)
        assert s[4].select_loss == "joints_2d_loss_p"

    def test_cam_stage_runs(self):
        import dataclasses

        from ihmr_tpu.data.synthetic import make_opt_inputs
        from ihmr_tpu.mano import synthetic_mano_model
        from ihmr_tpu.refine import OptConfig, run_stage, strategies

        model = synthetic_mano_model()
        params, batch = make_opt_inputs(model, batch=2, seed=0)
        cam_stage = dataclasses.replace(
            strategies["opt_with_cam"][4],
            epoch=5,
            filter_loss=(("joints_2d_loss_p", "+1000"),),
        )
        out = run_stage(model, params, batch, cam_stage, OptConfig(save_mid_freq=1, num_candidates=4))
        assert not np.allclose(np.asarray(out["cam"]), np.asarray(params["cam"]))
        for k in params:
            if k != "cam":
                np.testing.assert_allclose(np.asarray(out[k]), np.asarray(params[k]))
