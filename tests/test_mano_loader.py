"""MANO pkl loading: chumpy-shim unpickling, left-hand fix, mirror math."""

import numpy as np
import pytest
import scipy.sparse as sp

from ihmr_tpu.mano.loader import load_mano_model, load_mano_pair, synthetic_mano_model
from ihmr_tpu.utils import io_utils


class FakeCh:
    """Stands in for chumpy.Ch: pickles an object whose state carries the
    dense array under 'x' — the loader must unpickle it without chumpy."""

    def __init__(self, x):
        self.x = np.asarray(x)


def _write_fake_mano(path, mirror=False, buggy_left_shapedirs=None):
    rng = np.random.RandomState(0)
    vt = rng.randn(778, 3) * 0.01
    sd = rng.randn(778, 3, 10) * 0.001
    if buggy_left_shapedirs is not None:
        sd = buggy_left_shapedirs
    pd = rng.randn(778 * 3, 135) * 0.001
    jr = sp.csc_matrix(np.abs(rng.rand(16, 778)) * (rng.rand(16, 778) > 0.97))
    w = np.abs(rng.rand(778, 16))
    w /= w.sum(1, keepdims=True)
    faces = rng.randint(0, 778, size=(1538, 3)).astype(np.uint32)
    kintree = np.zeros((2, 16), np.int64)
    kintree[0] = [4294967295 if False else -1] + [0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14]
    data = dict(
        v_template=FakeCh(vt),
        shapedirs=FakeCh(np.concatenate([sd, rng.randn(778, 3, 290) * 1e-4], axis=2)),
        posedirs=FakeCh(pd.reshape(778, 3, 135)),
        J_regressor=jr,
        weights=FakeCh(w),
        f=faces,
        kintree_table=kintree,
        hands_mean=rng.randn(45) * 0.05,
        hands_components=rng.randn(45, 45),
    )
    io_utils.save_pkl(path, data)
    return data


def test_load_single_model(tmp_path):
    path = str(tmp_path / "MANO_RIGHT.pkl")
    raw = _write_fake_mano(path)
    model, hands_mean = load_mano_model(path, is_rhand=True)
    assert model.v_template.shape == (778, 3)
    np.testing.assert_allclose(np.asarray(model.v_template), raw["v_template"].x, atol=1e-6)
    assert model.shapedirs.shape == (778, 3, 10)  # truncated from 300 betas
    assert model.posedirs.shape == (135, 2334)
    assert model.j_regressor.shape == (16, 778)
    np.testing.assert_allclose(
        np.asarray(model.j_regressor), raw["J_regressor"].toarray(), atol=1e-6
    )
    assert model.faces.shape == (1538, 3)
    assert hands_mean.shape == (45,)
    # model arrays must be host (cpu) resident
    import jax

    assert all(
        d.platform == "cpu"
        for d in [model.v_template.devices().pop()]
    )


def test_left_shapedirs_bug_fix(tmp_path):
    """When left shapedirs x-row EQUALS right's (the known MANO bug), the
    loader must negate the left x-row (ref baseline_model.py:145-149)."""
    rng = np.random.RandomState(1)
    sd = rng.randn(778, 3, 10) * 0.001
    right_path = str(tmp_path / "MANO_RIGHT.pkl")
    left_path = str(tmp_path / "MANO_LEFT.pkl")
    _write_fake_mano(right_path, buggy_left_shapedirs=sd)
    _write_fake_mano(left_path, buggy_left_shapedirs=sd)  # identical = buggy
    pair = load_mano_pair(str(tmp_path))
    right, _ = pair["right"]
    left, _ = pair["left"]
    np.testing.assert_allclose(
        np.asarray(left.shapedirs[:, 0, :]), -np.asarray(right.shapedirs[:, 0, :]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(left.shapedirs[:, 1:, :]), np.asarray(right.shapedirs[:, 1:, :]), atol=1e-6
    )


def test_healthy_left_untouched(tmp_path):
    """Distinct left shapedirs must NOT be flipped."""
    rng = np.random.RandomState(2)
    _write_fake_mano(str(tmp_path / "MANO_RIGHT.pkl"), buggy_left_shapedirs=rng.randn(778, 3, 10))
    left_sd = rng.randn(778, 3, 10)
    _write_fake_mano(str(tmp_path / "MANO_LEFT.pkl"), buggy_left_shapedirs=left_sd)
    pair = load_mano_pair(str(tmp_path))
    left, _ = pair["left"]
    np.testing.assert_allclose(np.asarray(left.shapedirs), left_sd[..., :10], atol=1e-5)
