import numpy as np
import pytest

from ihmr_tpu import native
from ihmr_tpu.data import preprocess as pp

pytestmark = pytest.mark.skipif(not native.available(), reason="native toolchain unavailable")


class TestNative:
    def test_normalize_batch_matches_numpy(self):
        rng = np.random.RandomState(0)
        imgs = (rng.rand(3, 32, 48, 3) * 255).astype(np.uint8)
        out = native.normalize_batch(imgs)
        ref = np.stack([pp.normalize_image(im) for im in imgs])
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_letterbox_ratio_matches_reference(self):
        rng = np.random.RandomState(1)
        img = (rng.rand(100, 50, 3) * 255).astype(np.uint8)
        out, ratio = native.letterbox_normalize(img, 224)
        assert out.shape == (224, 224, 3)
        assert ratio == pytest.approx(224 / 100)
        # padded region (right side) is the normalized zero-pixel
        np.testing.assert_allclose(out[:, 120:], -1.0)
        # content region approximately matches the cv2 path
        ref_img, _ = pp.padding_and_resize(img, np.zeros((1, 3)), 224)
        ref = pp.normalize_image(ref_img)
        # bilinear implementations differ at edges; compare interior coarsely
        diff = np.abs(out[4:220, 4:108] - ref[4:220, 4:108])
        assert np.mean(diff) < 0.05

    def test_letterbox_batch(self):
        rng = np.random.RandomState(2)
        imgs = (rng.rand(4, 64, 80, 3) * 255).astype(np.uint8)
        out, ratios = native.letterbox_normalize_batch(imgs, 128)
        assert out.shape == (4, 128, 128, 3)
        np.testing.assert_allclose(ratios, 128 / 80)
        single, r0 = native.letterbox_normalize(imgs[0], 128)
        np.testing.assert_allclose(out[0], single, atol=1e-6)
