"""Training losses for the three networks (port of reference network/loss.py,
pure jnp, per-sample outputs like the reference's reduction='none' style).
"""
import jax.numpy as jnp

from gen6d_tpu.geometry.pose import pose_apply
from gen6d_tpu.geometry.rotations import quat_apply


def bce_with_logits(logits, labels):
    """torch BCEWithLogitsLoss(reduction='none')."""
    return (jnp.maximum(logits, 0) - logits * labels +
            jnp.log1p(jnp.exp(-jnp.abs(logits))))


def _cell_coords(h, w):
    """(h,w,2) cell-center coordinates as (x, y) (network/operator.py:22-24)."""
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing='ij')
    return jnp.stack([xs, ys], -1)


def detection_score_loss(scores, cens, pool_ratio=8, score_diff_thresh=1.5):
    """DetectionSoftmaxLoss (loss.py:22-50): pos/neg-balanced BCE on the score
    heatmap vs a disk label around the GT center.

    scores: (qn,h,w,1); cens: (qn,2) in query pixels -> (qn,) loss.
    """
    qn, h, w, _ = scores.shape
    center = (cens + 0.5) / pool_ratio - 0.5
    coords = _cell_coords(h, w)[None]
    dist = jnp.linalg.norm(coords - center[:, None, None, :], axis=-1)
    labels = (dist < score_diff_thresh).astype(jnp.float32)
    loss = bce_with_logits(scores[..., 0].reshape(qn, -1), labels.reshape(qn, -1))
    labels = labels.reshape(qn, -1)
    loss_pos = jnp.sum(loss * labels, 1) / (jnp.sum(labels, 1) + 1e-3)
    loss_neg = jnp.sum(loss * (1 - labels), 1) / (jnp.sum(1 - labels, 1) + 1e-3)
    return (loss_pos + loss_neg) / 2.0


def detection_offset_scale_loss(offset_pr, scale_pr, cens, scale_gt,
                                pool_ratio=8, diff_thresh=1.5, scale_ratio=1.0,
                                use_offset_loss=True):
    """DetectionOffsetAndScaleLoss (loss.py:52-106): masked L2 on the offset map
    and the log2-scale map at cells near the GT center.

    offset_pr: (qn,h,w,2); scale_pr: (qn,h,w,1); cens: (qn,2) px;
    scale_gt: (qn,) -> (loss_offset (qn,), loss_scale (qn,)).
    """
    qn, h, w, _ = offset_pr.shape
    center = (cens + 0.5) / pool_ratio - 0.5
    coords = _cell_coords(h, w)[None]
    diff = center[:, None, None, :] - coords  # qn,h,w,2
    mask = (jnp.linalg.norm(diff, axis=-1) < diff_thresh).astype(jnp.float32)
    msum = jnp.sum(mask.reshape(qn, -1), 1) + 1e-4

    scale_diff = (scale_pr[..., 0] - jnp.log2(scale_gt)[:, None, None]) ** 2
    loss_scale = jnp.sum((scale_diff * mask).reshape(qn, -1), 1) / msum
    loss_scale = loss_scale * scale_ratio
    if use_offset_loss:
        off_diff = jnp.sum((offset_pr - diff) ** 2, -1)
        loss_offset = jnp.sum((off_diff * mask).reshape(qn, -1), 1) / msum
    else:
        loss_offset = jnp.zeros_like(loss_scale)
    return loss_offset, loss_scale


def selection_loss(logits_pr, scores_gt, angles_pr, angles_gt, gt_ref_ids,
                   normalize_gt_score=True):
    """SelectionLoss (loss.py:109-141).

    logits_pr/angles_pr: (qn,rfn); scores_gt: (qn,rfn) view correlations;
    angles_gt: (qn,) rad; gt_ref_ids: (qn,) -> (loss_score, loss_angle) (qn,).
    """
    if normalize_gt_score:
        lo = jnp.min(scores_gt, 1, keepdims=True)
        hi = jnp.max(scores_gt, 1, keepdims=True)
        scores_gt = (scores_gt - lo) / jnp.maximum(hi - lo, 1e-4)
    else:
        scores_gt = (scores_gt + 1) / 2
    loss_score = jnp.mean(bce_with_logits(logits_pr, scores_gt), 1)

    qn = angles_pr.shape[0]
    ang_pr = angles_pr[jnp.arange(qn), gt_ref_ids]
    ang_gt = angles_gt * 2 / jnp.pi  # [-pi/2,pi/2] -> [-1,1] (loss.py:139)
    loss_angle = (ang_pr - ang_gt) ** 2
    return loss_score, loss_angle


def apply_rigid_transformation(grids, center, scale, offset, quaternion):
    """RefinerLoss.apply_rigid_transformation (loss.py:152-167): rotate around
    the center, add the 2D offset to the center, scale its depth.

    grids: (qn,pn,3); center: (qn,1,3); scale: (qn,1); offset: (qn,2);
    quaternion: (qn,4) -> (qn,pn,3).
    """
    pn = grids.shape[1]
    rotated = quat_apply(jnp.repeat(quaternion[:, None], pn, 1), grids - center)
    center = center.at[:, :, :2].add(offset[:, None, :2])
    center = center.at[:, :, 2:].multiply(scale[:, None, :])
    return rotated + center


def refiner_loss_raw(quat_pr, offset_pr, scale_pr, quat_gt, offset_gt, scale_gt,
                     grids, center, poses_in, scale_log_base=2.0):
    """RefinerLoss with loss_space='raw' (loss.py:184-188): compare predicted
    vs GT decomposed transforms applied to the grid points."""
    center_in = pose_apply(poses_in, center[:, None, :])
    grids_gt = apply_rigid_transformation(grids, center_in, scale_gt[:, None],
                                          offset_gt, quat_gt)
    grids_pr = apply_rigid_transformation(grids, center_in,
                                          scale_log_base ** scale_pr,
                                          offset_pr, quat_pr)
    return jnp.mean(jnp.sum((grids_gt - grids_pr) ** 2, -1), 1)


def refiner_loss(quat_pr, offset_pr, scale_pr, grids, center, poses_in,
                 poses_sim_in_to_que, scale_log_base=2.0):
    """RefinerLoss 'sim' space (loss.py:169-193): apply predicted vs GT
    similarity transform to the volume grid points; mean squared distance.

    quat_pr: (qn,4); offset_pr: (qn,2); scale_pr: (qn,1); grids: (qn,pn,3)
    camera-frame volume points; center: (qn,3) object center; poses_in:
    (qn,3,4); poses_sim_in_to_que: (qn,3,4) -> (qn,).
    """
    center_in = pose_apply(poses_in, center[:, None, :])  # qn,1,3
    pn = grids.shape[1]
    rot = quat_apply(jnp.repeat(quat_pr[:, None], pn, 1), grids - center_in)
    grids_pr = (scale_log_base ** scale_pr[:, None]) * rot + center_in
    grids_pr = grids_pr.at[..., :2].add(offset_pr[:, None, :2])
    grids_gt = pose_apply(poses_sim_in_to_que, grids)
    return jnp.mean(jnp.sum((grids_gt - grids_pr) ** 2, -1), 1)
