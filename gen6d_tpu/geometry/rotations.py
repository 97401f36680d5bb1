"""Rotation representations and conversions (pure jnp, jit/vmap-able).

Replaces the reference's transforms3d / pytorch3d usage with explicit formulas.
Quaternions are w-first ``(w, x, y, z)``, matching transforms3d ``quat2mat``
(reference: utils/pose_utils.py:5) and pytorch3d ``quaternion_apply``
(reference: network/loss.py:9).
"""
import jax.numpy as jnp
from gen6d_tpu.utils.precision import f32


@f32
def rot_x(a):
    """Rotation about the x axis. Works on scalars or batched angles (...,)."""
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([o, z, z], -1),
        jnp.stack([z, c, -s], -1),
        jnp.stack([z, s, c], -1),
    ], -2)


@f32
def rot_y(a):
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, z, s], -1),
        jnp.stack([z, o, z], -1),
        jnp.stack([-s, z, c], -1),
    ], -2)


@f32
def rot_z(a):
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, -s, z], -1),
        jnp.stack([s, c, z], -1),
        jnp.stack([z, z, o], -1),
    ], -2)


@f32
def look_at_rotation(point):
    """Rotation that (approximately) looks at ``point`` in normalized image coords.

    ``R @ x_raw -> x_lookat``. Matches reference utils/base_utils.py:657-666:
    ``euler2mat(np.arctan2(y,1),0,0,'sxyz') @ euler2mat(-np.arctan2(x,1),0,0,'syxz')``
    which reduces to ``rot_x(arctan2(y,1)) @ rot_y(-arctan2(x,1))``.

    point: (..., 2) -> (..., 3, 3)
    """
    x = point[..., 0]
    y = point[..., 1]
    return rot_x(jnp.arctan2(y, jnp.ones_like(y))) @ rot_y(-jnp.arctan2(x, jnp.ones_like(x)))


@f32
def inplane_angle_szyx(R):
    """First euler angle of ``R`` in the static-zyx convention.

    Matches ``transforms3d.euler.mat2euler(R, 'szyx')[0]`` as used at reference
    utils/pose_utils.py:98 to extract the in-plane (z) rotation component:
    for R = rot_x(ak) @ rot_y(aj) @ rot_z(ai), row 0 is
    [cos(aj)cos(ai), -cos(aj)sin(ai), sin(aj)], so ai = atan2(-R[0,1], R[0,0]).

    R: (..., 3, 3) -> (...)
    """
    return jnp.arctan2(-R[..., 0, 1], R[..., 0, 0])


@f32
def quat_to_mat(q):
    """w-first unit quaternion -> rotation matrix. (..., 4) -> (..., 3, 3).

    Matches transforms3d.quaternions.quat2mat (reference utils/pose_utils.py:239):
    normalizes internally; near-zero quaternions map to identity.
    """
    n = jnp.sum(q * q, axis=-1, keepdims=True)
    # transforms3d returns eye(3) for ||q||^2 < eps; we just guard the division.
    q = q * jnp.sqrt(2.0 / jnp.maximum(n, 1e-12))
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1.0 - (y * y + z * z), x * y - z * w, x * z + y * w], -1),
        jnp.stack([x * y + z * w, 1.0 - (x * x + z * z), y * z - x * w], -1),
        jnp.stack([x * z - y * w, y * z + x * w, 1.0 - (x * x + y * y)], -1),
    ], -2)


@f32
def mat_to_quat(R):
    """Rotation matrix -> w-first unit quaternion with w >= 0. (...,3,3) -> (...,4).

    Branchless (jit-safe) variant of the standard Shepperd method: computes all
    four candidate constructions and selects the best-conditioned one.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    qw0 = safe_sqrt(1.0 + tr)  # = 2w
    q0 = jnp.stack([qw0, (m21 - m12) / qw0, (m02 - m20) / qw0, (m10 - m01) / qw0], -1) * 0.5

    qx1 = safe_sqrt(1.0 + m00 - m11 - m22)  # = 2x
    q1 = jnp.stack([(m21 - m12) / qx1, qx1, (m01 + m10) / qx1, (m02 + m20) / qx1], -1) * 0.5

    qy2 = safe_sqrt(1.0 - m00 + m11 - m22)  # = 2y
    q2 = jnp.stack([(m02 - m20) / qy2, (m01 + m10) / qy2, qy2, (m12 + m21) / qy2], -1) * 0.5

    qz3 = safe_sqrt(1.0 - m00 - m11 + m22)  # = 2z
    q3 = jnp.stack([(m10 - m01) / qz3, (m02 + m20) / qz3, (m12 + m21) / qz3, qz3], -1) * 0.5

    # pick the construction whose pivot is largest
    cand = jnp.stack([q0, q1, q2, q3], -2)  # (...,4,4)
    pivots = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], -1)
    idx = jnp.argmax(pivots, axis=-1)
    q = jnp.take_along_axis(cand, idx[..., None, None].astype(jnp.int32).repeat(4, -1), -2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.where(q[..., :1] < 0, -q, q)


@f32
def quat_apply(q, pts):
    """Rotate points by a w-first quaternion. q: (...,4), pts: (...,3) -> (...,3).

    Matches pytorch3d.transforms.quaternion_apply (reference network/loss.py:9).
    """
    w = q[..., :1]
    v = q[..., 1:]
    uv = jnp.cross(v, pts)
    uuv = jnp.cross(v, uv)
    return pts + 2.0 * (w * uv + uuv)


@f32
def rotation_angle(R):
    """Geodesic angle of a rotation matrix (radians). (...,3,3) -> (...).

    Replaces transforms3d.axangles.mat2axangle angle extraction
    (reference utils/pose_utils.py:163).
    """
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    return jnp.arccos(jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0))


@f32
def angle_to_rotation_2d(angle):
    """2D rotation matrix. Matches reference utils/base_utils.py:627-629.

    angle: (...) -> (..., 2, 2)
    """
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.stack([
        jnp.stack([c, -s], -1),
        jnp.stack([s, c], -1),
    ], -2)
