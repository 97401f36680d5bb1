"""Native C++ library tests: decode vs PIL, warps vs cv2."""
import numpy as np
import pytest
import cv2
from PIL import Image

from gen6d_tpu.utils import native


@pytest.fixture(scope='module', autouse=True)
def require_native():
    if not native.available():
        pytest.skip('native library not built')


class TestDecode:
    def test_jpeg_roundtrip(self, tmp_path, rng):
        img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
        p = str(tmp_path / 'a.jpg')
        Image.fromarray(img).save(p, quality=95)
        ours = native.decode_jpeg(p)
        ref = np.asarray(Image.open(p).convert('RGB'))
        assert ours.shape == ref.shape
        assert np.abs(ours.astype(int) - ref.astype(int)).mean() < 2.0

    def test_png_roundtrip(self, tmp_path, rng):
        img = (rng.rand(32, 40, 3) * 255).astype(np.uint8)
        p = str(tmp_path / 'a.png')
        Image.fromarray(img).save(p)
        ours = native.decode_png(p)
        np.testing.assert_array_equal(ours[:, :, :3], img)

    def test_batch_load(self, tmp_path, rng):
        paths = []
        imgs = []
        for i in range(6):
            img = (rng.rand(30 + i, 40, 3) * 255).astype(np.uint8)
            p = str(tmp_path / f'{i}.jpg')
            Image.fromarray(img).save(p, quality=100)
            paths.append(p)
            imgs.append(img)
        out, fails = native.load_jpeg_batch(paths, cap_hw=(64, 64), threads=4)
        assert fails == 0
        for o, i in zip(out, imgs):
            assert o.shape == i.shape

    def test_missing_file(self):
        assert native.decode_jpeg('/nonexistent.jpg') is None


class TestWarps:
    def test_affine_matches_cv2(self, rng):
        img = (rng.rand(50, 60, 3) * 255).astype(np.uint8)
        M = np.array([[0.8, 0.1, 5.0], [-0.05, 0.9, 3.0]], np.float32)
        ours = native.warp_affine_u8(img, M, (40, 48))
        ref = cv2.warpAffine(img, M, (48, 40), flags=cv2.INTER_LINEAR)
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 2

    def test_perspective_matches_cv2(self, rng):
        img = (rng.rand(50, 60, 3) * 255).astype(np.uint8)
        H = np.array([[0.9, 0.05, 4.0], [-0.02, 1.05, -2.0],
                      [1e-4, -5e-5, 1.0]], np.float32)
        ours = native.warp_perspective_u8(img, H, (44, 52))
        ref = cv2.warpPerspective(img, H, (52, 44), flags=cv2.INTER_LINEAR)
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 2
