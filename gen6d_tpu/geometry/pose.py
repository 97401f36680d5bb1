"""Rigid/similarity pose algebra on [3,4] world->camera matrices (pure jnp).

Mirrors the reference's pose helpers (utils/base_utils.py:499-524,
dataset/database.py:399-410) with batch broadcasting.
"""
import jax.numpy as jnp
from gen6d_tpu.utils.precision import f32


@f32
def identity_pose():
    """Matches get_identity_pose (base_utils.py:499-500)."""
    return jnp.concatenate([jnp.eye(3, dtype=jnp.float32),
                            jnp.zeros([3, 1], jnp.float32)], 1)


@f32
def pose_inverse(pose):
    """Inverse of a rigid pose. Matches pose_inverse (base_utils.py:502-505)."""
    R = jnp.swapaxes(pose[..., :3], -1, -2)
    t = -R @ pose[..., 3:]
    return jnp.concatenate([R, t], -1)


@f32
def similarity_pose_inverse(pose):
    """Inverse of a similarity pose (general invertible A). Matches
    similarity_pose_inverse (base_utils.py:507-510)."""
    A = jnp.linalg.inv(pose[..., :3])
    t = -A @ pose[..., 3:]
    return jnp.concatenate([A, t], -1)


@f32
def pose_compose(pose0, pose1):
    """Apply pose0 first, then pose1. Matches pose_compose (base_utils.py:512-521)."""
    R = pose1[..., :3] @ pose0[..., :3]
    t = pose1[..., :3] @ pose0[..., 3:] + pose1[..., 3:]
    return jnp.concatenate([R, t], -1)


@f32
def pose_apply(pose, pts):
    """Transform points. pose: (...,3,4), pts: (...,n,3) or (...,3) -> same shape.
    Matches transform_points_pose / pose_apply (base_utils.py:390-394,523)."""
    single = pts.ndim == pose.ndim - 1
    if single:
        pts = pts[..., None, :]
    out = pts @ jnp.swapaxes(pose[..., :3], -1, -2) + jnp.swapaxes(pose[..., 3:], -1, -2)
    if single:
        out = out[..., 0, :]
    return out


@f32
def camera_position(pose):
    """Camera center in world coords: ``-R^T t``. (...,3,4) -> (...,3)."""
    return (-jnp.swapaxes(pose[..., :3], -1, -2) @ pose[..., 3:])[..., 0]


@f32
def compute_relative_transformation(pose0, pose1):
    """x1 = R x0 + t with x0 = pose0 x, x1 = pose1 x.
    Matches compute_relative_transformation (base_utils.py:302-312)."""
    R = pose1[..., :3] @ jnp.swapaxes(pose0[..., :3], -1, -2)
    t = pose1[..., 3:] - R @ pose0[..., 3:]
    return jnp.concatenate([R, t], -1)


@f32
def normalize_pose(pose, scale, offset):
    """Pose for the scaled/offset object frame: x_new = x*scale + offset.
    Matches normalize_pose (dataset/database.py:399-404)."""
    R = pose[..., :3]
    t = pose[..., 3]
    t_ = jnp.einsum('...ij,...j->...i', R, -offset) + scale * t
    return jnp.concatenate([R, t_[..., None]], -1)


@f32
def denormalize_pose(pose, scale, offset):
    """Inverse of normalize_pose. Matches denormalize_pose (database.py:406-410)."""
    R = pose[..., :3]
    t = pose[..., 3]
    t_ = jnp.einsum('...ij,...j->...i', R, offset) / scale + t / scale
    return jnp.concatenate([R, t_[..., None]], -1)
