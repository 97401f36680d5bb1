"""2D similarity-transform algebra on [2,3] matrices (pure jnp, batched).

A transform ``M = [A | t]`` acts as ``x' = A @ x + t``. Mirrors the reference's
``transformation_*_2d`` family (utils/base_utils.py:596-655) but jit/vmap-able
and broadcastable over leading batch dims.
"""
import jax.numpy as jnp

from gen6d_tpu.geometry.rotations import angle_to_rotation_2d
from gen6d_tpu.utils.precision import f32


@f32
def offset_2d(x, y):
    """Translation transform. Matches transformation_offset_2d (base_utils.py:631)."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    z, o = jnp.zeros_like(x), jnp.ones_like(x)
    return jnp.stack([
        jnp.stack([o, z, x], -1),
        jnp.stack([z, o, y], -1),
    ], -2)


@f32
def scale_2d(scale):
    """Isotropic scale transform. Matches transformation_scale_2d (base_utils.py:634)."""
    s = jnp.asarray(scale, jnp.float32)
    z = jnp.zeros_like(s)
    return jnp.stack([
        jnp.stack([s, z, z], -1),
        jnp.stack([z, s, z], -1),
    ], -2)


@f32
def rotation_2d(angle):
    """Rotation transform. Matches transformation_rotation_2d (base_utils.py:637)."""
    a = jnp.asarray(angle, jnp.float32)
    R = angle_to_rotation_2d(a)
    return jnp.concatenate([R, jnp.zeros_like(R[..., :1])], -1)


@f32
def compose_2d(t0, t1):
    """Apply ``t0`` first, then ``t1``. Matches transformation_compose_2d
    (base_utils.py:610-622)."""
    A0, b0 = t0[..., :2], t0[..., 2]
    A1, b1 = t1[..., :2], t1[..., 2]
    A = A1 @ A0
    b = jnp.einsum('...ij,...j->...i', A1, b0) + b1
    return jnp.concatenate([A, b[..., None]], -1)


@f32
def inverse_2d(t):
    """Inverse transform. Matches transformation_inverse_2d (base_utils.py:596-608)."""
    A = t[..., :2]
    b = t[..., 2:]
    Ai = jnp.linalg.inv(A)
    bi = -Ai @ b
    return jnp.concatenate([Ai, bi], -1)


@f32
def apply_2d(t, pts):
    """Apply to points. t: (...,2,3), pts: (...,n,2) -> (...,n,2).
    Matches transformation_apply_2d (base_utils.py:624)."""
    return pts @ jnp.swapaxes(t[..., :2], -1, -2) + jnp.swapaxes(t[..., 2:], -1, -2)


@f32
def decompose_2d(t):
    """(scale, rotation angle, offset) of a similarity transform.
    Matches transformation_decompose_2d (base_utils.py:640-644)."""
    A = t[..., :2]
    det = A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]
    scale = jnp.sqrt(jnp.maximum(det, 1e-16))
    rotation = jnp.arctan2(A[..., 1, 0], A[..., 0, 0])
    offset = t[..., 2]
    return scale, rotation, offset


@f32
def crop_transform_2d(position, scale, angle, size, new_position=None):
    """The [2,3] affine used by transformation_crop (base_utils.py:646-655):
    translate ``-position``, scale, rotate, then translate to the crop center
    (``size/2`` or ``new_position``). Returns only M; the warp itself lives in
    gen6d_tpu.ops.warp.
    """
    M = offset_2d(-position[..., 0], -position[..., 1])
    M = compose_2d(M, scale_2d(scale))
    M = compose_2d(M, rotation_2d(angle))
    if new_position is None:
        half = jnp.asarray(size, jnp.float32) / 2.0
        M = compose_2d(M, offset_2d(half, half))
    else:
        M = compose_2d(M, offset_2d(new_position[..., 0], new_position[..., 1]))
    return M
