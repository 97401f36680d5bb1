"""Jitted training steps for the three networks (the TPU equivalent of the
reference's Trainer loss/backward/step body, trainer.py:109-140).

Each make_*_train_step returns ``step(params, opt_state, batch) -> (params,
opt_state, metrics)``, jitted; pass ``mesh`` + shardings at jit time for
multi-chip training (dp over the query batch, view over reference views).
"""
import jax
import jax.numpy as jnp
import optax

from gen6d_tpu.geometry.pose import pose_apply
from gen6d_tpu.train import losses as L


def _sum_losses(metrics):
    """Total = sum of every entry whose key starts with 'loss' (trainer.py:134-137)."""
    return sum(jnp.mean(v) for k, v in metrics.items() if k.startswith('loss'))


def _freeze_bn_grads(grads):
    """Zero gradients on FrozenBatchNorm parameters ('bn' subtrees): the
    reference disables BN grads even in train_feats mode (detector.py:123-128,
    146-150). A no-op when the backbone is frozen (grads already zero)."""
    def walk(tree, in_bn=False):
        if isinstance(tree, dict):
            return {k: walk(v, in_bn or k == 'bn') for k, v in tree.items()}
        return jnp.zeros_like(tree) if in_bn else tree
    return walk(grads) if isinstance(grads, dict) else grads


def make_detector_train_step(detector, optimizer, jit_kwargs=None,
                             scale_ratio=1.0):
    """``scale_ratio`` weights the log2-scale regression term (the reference's
    DetectionOffsetAndScaleLoss scale_ratio cfg, loss.py:56); >1 counteracts
    the scale head's shrinkage toward the augmentation prior mean."""
    def loss_fn(params, batch):
        out = detector.apply(params, batch['ref_imgs'], batch['que_imgs'])
        loss_cls = L.detection_score_loss(out['scores'], batch['cens'],
                                          out['pool_ratio'])
        loss_offset, loss_scale = L.detection_offset_scale_loss(
            out['select_pr_offset'], out['select_pr_scale'], batch['cens'],
            batch['scale_diff'], out['pool_ratio'], scale_ratio=scale_ratio)
        metrics = {'loss_cls': loss_cls, 'loss_offset': loss_offset,
                   'loss_scale': loss_scale}
        return _sum_losses(metrics), metrics

    def step(params, opt_state, batch):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch)
        grads = _freeze_bn_grads(grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {k: jnp.mean(v) for k, v in metrics.items()}
        metrics['loss_total'] = loss
        return params, opt_state, metrics

    return jax.jit(step, **(jit_kwargs or {}))


def make_selector_train_step(selector, optimizer, jit_kwargs=None):
    def loss_fn(params, batch):
        out = selector.apply(params, batch['ref_imgs'], batch['ref_poses'],
                             batch['object_center'], batch['object_vert'],
                             batch['que_imgs'])
        loss_score, loss_angle = L.selection_loss(
            out['ref_vp_logits'], batch['ref_vp_scores'], out['angles_pr'],
            batch['angles_r2q'], batch['gt_ref_ids'])
        metrics = {'loss_score': loss_score, 'loss_angle': loss_angle}
        return _sum_losses(metrics), metrics

    def step(params, opt_state, batch):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch)
        grads = _freeze_bn_grads(grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {k: jnp.mean(v) for k, v in metrics.items()}
        metrics['loss_total'] = loss
        return params, opt_state, metrics

    return jax.jit(step, **(jit_kwargs or {}))


def make_refiner_train_step(refiner, optimizer, jit_kwargs=None):
    def loss_fn(params, batch):
        out = refiner.apply(params, batch['que_imgs'], batch['que_Ks_in'],
                            batch['que_poses_in'], batch['ref_imgs'],
                            batch['ref_poses'], batch['ref_Ks'])
        # grids: volume coords in the input camera frame (refiner.py:264-267)
        grids = pose_apply(batch['que_poses_in'], out['vol_coords'])
        loss_pose = L.refiner_loss(out['rotation'], out['offset'], out['scale'],
                                   grids, batch['object_center'],
                                   batch['que_poses_in'],
                                   batch['poses_sim_in_to_que'])
        metrics = {'loss_pose': loss_pose}
        return _sum_losses(metrics), metrics

    def step(params, opt_state, batch):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch)
        grads = _freeze_bn_grads(grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {k: jnp.mean(v) for k, v in metrics.items()}
        metrics['loss_total'] = loss
        return params, opt_state, metrics

    return jax.jit(step, **(jit_kwargs or {}))


def adam(schedule):
    """The reference's Adam optimizer (trainer.py:78-80) with a step schedule."""
    return optax.adam(schedule)
