"""Pinhole-camera projection and look-at rectification (pure jnp).

Mirrors reference utils/base_utils.py:256-265 and utils/pose_utils.py:48-58.
"""
import jax.numpy as jnp

from gen6d_tpu.geometry.rotations import look_at_rotation
from gen6d_tpu.geometry.pose import pose_apply
from gen6d_tpu.utils.precision import f32


@f32
def project_points(pts, pose, K):
    """Project world points into an image.

    pts: (...,n,3), pose: (...,3,4), K: (...,3,3) -> (pts2d (...,n,2), depth (...,n)).
    Matches project_points (base_utils.py:256-265) including the +-1e-4 depth clamp.
    """
    cam = pose_apply(pose, pts)
    img = cam @ jnp.swapaxes(K, -1, -2)
    dpt = img[..., 2]
    # clamp tiny |depth| away from zero, preserving sign (zero -> +1e-4)
    dpt = jnp.where(jnp.abs(dpt) < 1e-4,
                    jnp.where(dpt < 0, -1e-4, 1e-4),
                    dpt)
    pts2d = img[..., :2] / dpt[..., None]
    return pts2d, dpt


@f32
def pts_to_hpts(pts):
    return jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], -1)


@f32
def hpts_to_pts(hpts):
    return hpts[..., :-1] / hpts[..., -1:]


@f32
def let_me_look_at_2d(image_center, K):
    """Rectifying rotation + focal for a pixel location.

    image_center: (...,2), K: (...,3,3) -> (R_new (...,3,3), f_new (...)).
    Matches let_me_look_at_2d (pose_utils.py:52-58).
    """
    f_raw = (K[..., 0, 0] + K[..., 1, 1]) / 2.0
    centered = image_center - K[..., :2, 2]
    f_new = jnp.sqrt(jnp.sum(centered * centered, -1) + f_raw * f_raw)
    R_new = look_at_rotation(centered / f_raw[..., None])
    return R_new, f_new


@f32
def let_me_look_at(pose, K, obj_center):
    """Rectifying rotation + focal for the projected object center.
    Matches let_me_look_at (pose_utils.py:48-50)."""
    cen2d, _ = project_points(obj_center[..., None, :], pose, K)
    return let_me_look_at_2d(cen2d[..., 0, :], K)


@f32
def view_correlation(que_poses, ref_poses, center):
    """Cosine similarity of unit camera directions around ``center``.

    que_poses: (qn,3,4), ref_poses: (rfn,3,4), center: (3) -> (qn,rfn).
    Matches compute_normalized_view_correlation (utils/database_utils.py:27-52).
    """
    que_cams = (-jnp.swapaxes(que_poses[:, :, :3], -1, -2) @ que_poses[:, :, 3:])[..., 0]
    ref_cams = (-jnp.swapaxes(ref_poses[:, :, :3], -1, -2) @ ref_poses[:, :, 3:])[..., 0]
    qd = que_cams - center[None]
    rd = ref_cams - center[None]
    qd = qd / jnp.linalg.norm(qd, axis=1, keepdims=True)
    rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
    return jnp.sum(qd[:, None] * rd[None, :], 2)
