"""Parity of the Pallas windowed hat-matmul warp against the gather warp.

The Pallas kernel (ops/warp_pallas.py) must reproduce ops/warp.py's
cv2-convention bilinear warp (itself cv2-parity-tested in tests/test_ops.py)
for every geometry the refine prewarp produces: scale within the window
envelope, arbitrary in-plane rotation, perspective terms, and zero-fill
borders. Runs the kernel in interpret mode (CPU)."""
import numpy as np
import pytest

jax = pytest.importorskip('jax')
import jax.numpy as jnp

from gen6d_tpu.ops.warp import warp_affine, warp_perspective
from gen6d_tpu.ops.warp_pallas import warp_affine_batch, warp_perspective_batch


def _crop_H(rng, src_hw, out, scale, angle):
    """look_at_crop-shaped homography: center crop at ``scale`` px/px with
    in-plane ``angle`` plus a small perspective term."""
    hs, ws = src_hw
    ca, sa = np.cos(angle), np.sin(angle)
    # dst <- src: translate src center to origin, rotate+scale, center in dst
    A = np.asarray([[ca, -sa], [sa, ca]]) / scale
    t = -A @ np.asarray([ws / 2, hs / 2]) + np.asarray([out / 2, out / 2])
    H = np.eye(3)
    H[:2, :2] = A
    H[:2, 2] = t
    H[2, :2] = rng.uniform(-2e-4, 2e-4, 2)  # mild perspective
    return H.astype(np.float32)


def test_warp_perspective_batch_parity():
    rng = np.random.RandomState(0)
    hs, ws, out = 160, 192, 64
    n = 6
    imgs = rng.rand(n, hs, ws, 3).astype(np.float32)
    Hs = np.stack([
        _crop_H(rng, (hs, ws), out,
                scale=rng.uniform(0.6, 1.8),
                angle=rng.uniform(-np.pi, np.pi)) for _ in range(n)])
    got = warp_perspective_batch(jnp.asarray(imgs), jnp.asarray(Hs),
                                 (out, out), band=96, interpret=True)
    want = np.stack([np.asarray(warp_perspective(imgs[i], Hs[i], (out, out)))
                     for i in range(n)])
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_warp_zero_fill_border():
    """A warp that pushes most samples outside the source must produce exact
    zeros there (cv2.BORDER_CONSTANT semantics), not edge smear."""
    rng = np.random.RandomState(1)
    hs = ws = 96
    out = 64
    img = rng.rand(1, hs, ws, 3).astype(np.float32) + 0.5  # strictly positive
    H = np.eye(3, dtype=np.float32)
    H[0, 2] = 40.0  # shift: the left 40 output cols sample x < 0
    got = np.asarray(warp_perspective_batch(
        jnp.asarray(img), jnp.asarray(H[None]), (out, out), band=96,
        interpret=True))[0]
    want = np.asarray(warp_perspective(img[0], H, (out, out)))
    np.testing.assert_allclose(got, want, atol=2e-5)
    assert np.all(got[:, :40] == 0.0)


def test_warp_affine_batch_parity():
    rng = np.random.RandomState(2)
    hs, ws, out = 128, 128, 32
    imgs = rng.rand(2, hs, ws, 3).astype(np.float32)
    Ms = np.stack([_crop_H(rng, (hs, ws), out, 1.2, 0.7)[:2]
                   for _ in range(2)])
    got = warp_affine_batch(jnp.asarray(imgs), jnp.asarray(Ms), (out, out),
                            band=64, interpret=True)
    want = np.stack([np.asarray(warp_affine(imgs[i], Ms[i], (out, out)))
                     for i in range(2)])
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_vmap_lifts():
    """The estimator may call the batched warp under an outer vmap."""
    rng = np.random.RandomState(3)
    imgs = rng.rand(2, 3, 64, 64, 3).astype(np.float32)
    Hs = np.stack([[_crop_H(rng, (64, 64), 32, 1.0, 0.3) for _ in range(3)]
                   for _ in range(2)])
    fn = jax.vmap(lambda im, h: warp_perspective_batch(im, h, (32, 32),
                                                       band=48,
                                                       interpret=True))
    got = np.asarray(fn(jnp.asarray(imgs), jnp.asarray(Hs)))
    want = np.stack([[np.asarray(warp_perspective(imgs[i, j], Hs[i, j],
                                                  (32, 32)))
                      for j in range(3)] for i in range(2)])
    np.testing.assert_allclose(got, want, atol=2e-5)
