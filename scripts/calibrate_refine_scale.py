"""Fit the refiner's serving-path scale calibration constant.

At a ground-truth pose initialization the refiner should predict the identity
similarity (log2 scale 0); the from-scratch refiner instead carries a
conditional scale bias there, which compounds across refinement iterations
into a divergent depth drift. This script measures the bias on TRAINING
objects only (leakage-free): for each train scene it feeds GT poses of the
query half of ``synthetic_split`` through the real serving prewarp +
refiner network and records the predicted log2 scale.

Prints per-scene means and the recommended ``refine_scale_correction``
(the negated pooled mean) for the estimator config.

Usage: python scripts/calibrate_refine_scale.py [--cfg configs/gen6d_synthetic.yaml]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cfg', default='configs/gen6d_synthetic.yaml')
    ap.add_argument('--scenes', nargs='*', default=None)
    ap.add_argument('--n_views', type=int, default=128)
    ap.add_argument('--per_scene', type=int, default=16)
    ap.add_argument('--polish', action='store_true',
                    help='calibrate the cascade tail net (cfg refiner_polish) '
                         'instead of the coarse refiner — fits the '
                         'polish_{scale,rot}_correction estimator keys')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from gen6d_tpu.data import database as dbm
    from gen6d_tpu.pipeline.loader import load_estimator
    from gen6d_tpu.train.datasets import DEFAULT_TRAIN_SCENES

    scenes = args.scenes or [
        f'synthetic/{args.n_views}@{s.partition("@")[2]}:{s.partition("@")[0]}'
        for s in DEFAULT_TRAIN_SCENES]

    est = load_estimator(args.cfg)
    if args.polish:
        assert est.refiner_polish is not None, '--polish needs refiner_polish'
        est.refiner, est.refiner_params = (est.refiner_polish,
                                           est.refiner_polish_params)

    def raw_out(params, que_imgs, que_Ks, poses_in, ri, rp, rk, ns, no):
        # mirror of estimator._refine_iter_batch's prelude, returning the RAW
        # scale/rotation heads (before the config's correction constants)
        size = est.cfg['refine_size']
        (H_que, que_K_warp, in_pose_warp, _, top_idx, Hs_ref, ref_K_new,
         ref_pose_new) = jax.vmap(
            est._refine_pregeom, in_axes=(0, 0, None, None, None, None))(
            que_Ks, poses_in, rp, rk, ns, no)
        que_warp = est._batch_warp(que_imgs, H_que, size,
                                   est.cfg['warp_band_que'])
        sel_imgs = ri[top_idx]
        if sel_imgs.dtype == jnp.uint8:
            sel_imgs = sel_imgs.astype(jnp.float32) / 255.0
        qn, rn, hc, wc, ch = sel_imgs.shape
        ref_crops = est._batch_warp(
            sel_imgs.reshape(qn * rn, hc, wc, ch),
            Hs_ref.reshape(qn * rn, 3, 3), size,
            est.cfg['warp_band_ref']).reshape(qn, rn, size, size, ch)
        out = est.refiner.apply(params, que_warp, que_K_warp, in_pose_warp,
                                ref_crops, ref_pose_new, ref_K_new)
        return out['scale'][:, 0], out['rotation']

    fwd = jax.jit(raw_out)
    all_s = []
    all_q = []
    for scene in scenes:
        db = dbm.parse_database_name(scene)
        est.build(db, 'synthetic_split')
        ref = est.ref_info
        _, que_ids = dbm.get_database_split(db, 'synthetic_split')
        que_ids = que_ids[:args.per_scene]
        imgs = jnp.asarray(np.stack([db.get_image(i) for i in que_ids],
                                    0).astype(np.float32) / 255.0)
        Ks = jnp.asarray(np.stack([db.get_K(i) for i in que_ids], 0))
        gts = jnp.asarray(np.stack([db.get_pose(i) for i in que_ids], 0),
                          jnp.float32)
        s, q = fwd(est.refiner_params, imgs, Ks, gts,
                   ref['refine_imgs'], ref['refine_poses'],
                   ref['refine_Ks'], ref['norm_scale'], ref['norm_offset'])
        s = np.asarray(s, np.float64)
        q = np.asarray(q, np.float64)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        q[q[:, 0] < 0] *= -1
        all_s.append(s)
        all_q.append(q)
        ang = 2 * np.degrees(np.arccos(np.clip(q[:, 0], -1, 1)))
        print(f'{scene}: n={len(s)} scale mean {s.mean():+.4f} '
              f'std {s.std():.4f}  rot deg mean {ang.mean():.2f} '
              f'axis {np.round(np.mean(q[:, 1:], 0), 4)}')

    pooled = np.concatenate(all_s)
    qm = np.mean(np.concatenate(all_q), 0)
    qm /= np.linalg.norm(qm)
    print(f'pooled: n={len(pooled)} scale mean {pooled.mean():+.4f} '
          f'median {np.median(pooled):+.4f}')
    print(f'recommended refine_scale_correction: {-pooled.mean():+.4f}')
    print('recommended refine_rot_correction (mean bias quat, w-first): '
          f'[{qm[0]:.6f}, {qm[1]:.6f}, {qm[2]:.6f}, {qm[3]:.6f}]')


if __name__ == '__main__':
    main()
