"""Pose-evaluation metrics: ADD-0.1d, Prj-5, symmetric ADD, AUC.

Matches reference utils/pose_utils.py:149-215, vectorized over the query set.
"""
import jax
import jax.numpy as jnp
import numpy as np

from gen6d_tpu.geometry.camera import project_points
from gen6d_tpu.geometry.pose import pose_apply
from gen6d_tpu.geometry.rotations import rotation_angle
from gen6d_tpu.utils.precision import f32


@f32
def pose_errors(object_pts, pose_pr, pose_gt, K):
    """Single-pose errors. Matches compute_pose_errors (pose_utils.py:149-171).

    Returns (prj_err, obj_err, (rot_err_rad, cam_translation_err)).
    """
    pts2d_pr, _ = project_points(object_pts, pose_pr, K)
    pts2d_gt, _ = project_points(object_pts, pose_gt, K)
    prj_err = jnp.mean(jnp.linalg.norm(pts2d_pr - pts2d_gt, axis=-1))

    pts3d_pr = pose_apply(pose_pr, object_pts)
    pts3d_gt = pose_apply(pose_gt, object_pts)
    obj_err = jnp.mean(jnp.linalg.norm(pts3d_pr - pts3d_gt, axis=-1))

    dr = rotation_angle(pose_pr[:3, :3] @ pose_gt[:3, :3].T)
    cam_pr = -pose_pr[:3, :3].T @ pose_pr[:3, 3:]
    cam_gt = -pose_gt[:3, :3].T @ pose_gt[:3, 3:]
    dt = jnp.linalg.norm(cam_pr - cam_gt)
    return prj_err, obj_err, jnp.stack([jnp.abs(dr), dt])


@f32
def symmetric_obj_err(object_pts, pose_pr, pose_gt):
    """ADD-S style nearest-point error (pose_utils.py:192-197)."""
    p = pose_apply(pose_pr, object_pts)
    g = pose_apply(pose_gt, object_pts)
    d = jnp.linalg.norm(p[:, None] - g[None, :], axis=-1)
    return jnp.mean(jnp.min(d, axis=1))


@f32
def compute_metrics(object_pts, diameter, poses_gt, poses_pr, Ks, scale=1.0,
                    symmetric=False):
    """Batched ADD-0.1d / Prj-5 (+-sym). Matches compute_metrics_impl
    (pose_utils.py:187-215).

    poses_gt/poses_pr: (n,3,4), Ks: (n,3,3).
    """
    object_pts = jnp.asarray(object_pts, jnp.float32)
    poses_gt = jnp.asarray(poses_gt, jnp.float32)
    poses_pr = jnp.asarray(poses_pr, jnp.float32)
    Ks = jnp.asarray(Ks, jnp.float32)
    prj_errs, obj_errs, _ = jax.vmap(pose_errors, in_axes=(None, 0, 0, 0))(
        object_pts, poses_pr, poses_gt, Ks)
    obj_errs = obj_errs * scale
    results = {
        'add-0.1d': float(jnp.mean(obj_errs < diameter * 0.1)),
        'prj-5': float(jnp.mean(prj_errs < 5.0)),
        'obj_err_mean': float(jnp.mean(obj_errs)),
        'prj_err_mean': float(jnp.mean(prj_errs)),
    }
    if symmetric:
        sym = jax.vmap(symmetric_obj_err, in_axes=(None, 0, 0))(
            object_pts, poses_pr, poses_gt) * scale
        results['add-0.1d-sym'] = float(jnp.mean(sym < diameter * 0.1))
    return results


@f32
def compute_auc(errors, thresholds):
    """Recall-vs-error AUC. Matches compute_auc (pose_utils.py:173-185)."""
    errors = np.sort(np.asarray(errors))
    recall = (np.arange(len(errors)) + 1) / len(errors)
    errors = np.r_[0., errors]
    recall = np.r_[0., recall]
    aucs = []
    for t in thresholds:
        last_index = np.searchsorted(errors, t)
        r = np.r_[recall[:last_index], recall[last_index - 1]]
        e = np.r_[errors[:last_index], t]
        aucs.append(np.trapezoid(r, x=e) / t)
    return aucs
