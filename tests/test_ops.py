"""Golden tests of on-device image ops against cv2 / torch CPU (the reference's
numerical conventions: SURVEY.md hard part #1)."""
import cv2
import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from gen6d_tpu.ops import warp as W
from gen6d_tpu.ops import image as I
from gen6d_tpu.ops.sampling import sample_bilinear


def random_img(rng, h=64, w=80, c=3):
    return rng.rand(h, w, c).astype(np.float32)


class TestWarps:
    def test_warp_perspective_matches_cv2(self, rng):
        img = random_img(rng)
        # a representative look-at-crop homography: K_new @ R @ K^-1 shape
        H = np.array([[0.9, 0.08, 5.0],
                      [-0.05, 1.1, -3.0],
                      [1e-4, -2e-4, 1.0]], np.float32)
        ours = np.array(W.warp_perspective(jnp.asarray(img), jnp.asarray(H), (48, 56)))
        ref = cv2.warpPerspective(img, H, (56, 48), flags=cv2.INTER_LINEAR)
        # cv2 uses 5-bit fixed-point interpolation weights -> ~1/32 quantization
        assert np.abs(ours - ref).max() < 0.06
        assert np.abs(ours - ref).mean() < 0.01

    def test_warp_affine_matches_cv2(self, rng):
        img = random_img(rng)
        M = np.array([[0.7, 0.2, 4.0], [-0.15, 0.8, 6.0]], np.float32)
        ours = np.array(W.warp_affine(jnp.asarray(img), jnp.asarray(M), (50, 60)))
        ref = cv2.warpAffine(img, M, (60, 50), flags=cv2.INTER_LINEAR)
        assert np.abs(ours - ref).max() < 0.06
        assert np.abs(ours - ref).mean() < 0.01

    def test_warp_identity(self, rng):
        img = random_img(rng)
        out = np.array(W.warp_perspective(jnp.asarray(img), jnp.eye(3), img.shape[:2]))
        np.testing.assert_allclose(out, img, atol=1e-5)

    def test_border_zero(self, rng):
        img = np.ones([16, 16, 1], np.float32)
        M = np.array([[1.0, 0, 8.0], [0, 1.0, 0]], np.float32)  # shift right by 8
        out = np.array(W.warp_affine(jnp.asarray(img), jnp.asarray(M), (16, 16)))
        assert out[:, :7].max() == 0.0  # left half comes from outside the source
        assert out[:, 9:].min() == 1.0


class TestSampling:
    def test_matches_grid_sample(self, rng):
        """sample_bilinear at pixel coords == torch grid_sample(align_corners=False)
        after the reference's normalize_coords mapping (operator.py:4-17)."""
        feats = rng.rand(20, 24, 8).astype(np.float32)
        pts = np.stack([rng.rand(100) * 30 - 3, rng.rand(100) * 26 - 3], -1).astype(np.float32)

        ours = np.array(sample_bilinear(jnp.asarray(feats), jnp.asarray(pts)))

        h, w = 20, 24
        norm = ((pts + 0.5) / np.array([w, h]) * 2 - 1).astype(np.float32)  # normalize_coords
        t_feats = torch.from_numpy(feats.transpose(2, 0, 1))[None]
        t_grid = torch.from_numpy(norm)[None, None]  # 1,1,100,2
        ref = F.grid_sample(t_feats, t_grid, mode='bilinear', align_corners=False)
        ref = ref[0, :, 0].numpy().T
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestResizes:
    def test_bilinear_matches_torch(self, rng):
        img = rng.rand(2, 33, 47, 5).astype(np.float32)
        for size in [(16, 24), (66, 94), (60, 80)]:
            ours = np.array(I.resize_bilinear(jnp.asarray(img), size))
            t = torch.from_numpy(img.transpose(0, 3, 1, 2))
            ref = F.interpolate(t, size=size, mode='bilinear').numpy().transpose(0, 2, 3, 1)
            np.testing.assert_allclose(ours, ref, atol=2e-5)

    def test_nearest_matches_torch(self, rng):
        img = rng.rand(2, 128, 128, 3).astype(np.float32)
        for size in [(120, 120), (64, 64), (200, 200)]:
            ours = np.array(I.resize_nearest(jnp.asarray(img), size))
            t = torch.from_numpy(img.transpose(0, 3, 1, 2))
            ref = F.interpolate(t, size=size).numpy().transpose(0, 2, 3, 1)
            np.testing.assert_allclose(ours, ref, atol=0)

    def test_upsample_nearest_matches_torch(self, rng):
        x = rng.rand(1, 7, 9, 4).astype(np.float32)
        for k in (2, 4):
            ours = np.array(I.upsample_nearest(jnp.asarray(x), k))
            t = torch.from_numpy(x.transpose(0, 3, 1, 2))
            ref = F.interpolate(t, scale_factor=k).numpy().transpose(0, 2, 3, 1)
            np.testing.assert_allclose(ours, ref, atol=0)

    def test_normalize_imagenet(self, rng):
        img = rng.rand(1, 4, 4, 3).astype(np.float32)
        out = np.array(I.normalize_imagenet(jnp.asarray(img)))
        expected = (img - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
        np.testing.assert_allclose(out, expected, atol=1e-6)
