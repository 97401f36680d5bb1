"""On-device homography / affine warps.

These replace every cv2.warpPerspective / cv2.warpAffine in the reference
(look_at_crop utils/database_utils.py:21, transformation_crop
utils/base_utils.py:654, in-plane rotated refs estimator.py:162) so the whole
detect -> crop -> select -> refine loop stays on TPU. Matching cv2 semantics:
dst(x, y) = src(M^-1 @ (x, y, 1)) with bilinear interpolation and constant-zero
border; pixel centers at integer coordinates.
"""
import jax
import jax.numpy as jnp

from gen6d_tpu.ops.sampling import sample_bilinear
from gen6d_tpu.utils.precision import f32


def _dst_grid(out_hw):
    h, w = out_hw
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing='ij')
    return xs, ys


@f32
def warp_perspective(img, H, out_hw, fill_value=0.0):
    """cv2.warpPerspective(img, H, (w, h), INTER_LINEAR) equivalent.

    img: (h, w, c); H: (3, 3) forward homography (src -> dst); out_hw: (h, w).
    """
    # barrier: keep the 3x3 inverse out of the per-pixel fused computation
    Hi = jax.lax.optimization_barrier(jnp.linalg.inv(H))
    xs, ys = _dst_grid(out_hw)
    sx = Hi[0, 0] * xs + Hi[0, 1] * ys + Hi[0, 2]
    sy = Hi[1, 0] * xs + Hi[1, 1] * ys + Hi[1, 2]
    sz = Hi[2, 0] * xs + Hi[2, 1] * ys + Hi[2, 2]
    # guard division like the reference's projection clamp; samples behind the
    # plane land far out of range and hit the zero border
    sz = jnp.where(jnp.abs(sz) < 1e-8, 1e-8, sz)
    coords = jnp.stack([sx / sz, sy / sz], -1)
    return sample_bilinear(img, coords, fill_value)


@f32
def warp_affine(img, M, out_hw, fill_value=0.0):
    """cv2.warpAffine(img, M, (w, h), INTER_LINEAR) equivalent.

    img: (h, w, c); M: (2, 3) forward affine (src -> dst); out_hw: (h, w).
    """
    # invert the 2x3 affine
    A = M[:, :2]
    t = M[:, 2]
    Ai = jax.lax.optimization_barrier(jnp.linalg.inv(A))
    ti = -Ai @ t
    xs, ys = _dst_grid(out_hw)
    sx = Ai[0, 0] * xs + Ai[0, 1] * ys + ti[0]
    sy = Ai[1, 0] * xs + Ai[1, 1] * ys + ti[1]
    coords = jnp.stack([sx, sy], -1)
    return sample_bilinear(img, coords, fill_value)
