"""Fit the detector's serving-path scale calibration constant.

The from-scratch detector's scale head shows a systematic log2-scale bias on
the serving path (shrinkage toward the augmentation prior mean plus a
train/serve domain shift). This script measures it on TRAINING objects only
(never the held-out eval/val objects, so the constant is leakage-free):
for each train scene it builds the estimator reference set from the ref half
of ``synthetic_split``, runs the real detector serving path on the query half,
and compares the decoded scale against the camera-derived GT scale
(scale_rotation_difference_from_cameras vs the best-correlated normalized ref
view — the same GT definition used in training).

Prints per-scene medians and the recommended ``det_scale_correction`` (the
negated pooled median) to paste into the estimator config.

Usage: python scripts/calibrate_det_scale.py [--cfg configs/gen6d_synthetic.yaml]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cfg', default='configs/gen6d_synthetic.yaml')
    ap.add_argument('--scenes', nargs='*', default=None,
                    help="scene shorthands '<shape>-<texture>@<seed>'; "
                         'default: the training pool')
    ap.add_argument('--n_views', type=int, default=128)
    args = ap.parse_args()

    import jax.numpy as jnp
    from gen6d_tpu.data import database as dbm
    from gen6d_tpu.geometry.camera import view_correlation
    from gen6d_tpu.geometry.solvers import (
        scale_rotation_difference_from_cameras)
    from gen6d_tpu.pipeline.loader import load_estimator
    from gen6d_tpu.train.datasets import DEFAULT_TRAIN_SCENES

    scenes = args.scenes or [
        f'synthetic/{args.n_views}@{s.partition("@")[2]}:{s.partition("@")[0]}'
        for s in DEFAULT_TRAIN_SCENES]

    est = load_estimator(args.cfg)
    all_errs = []
    for scene in scenes:
        db = dbm.parse_database_name(scene)
        est.build(db, 'synthetic_split')
        _, que_ids = dbm.get_database_split(db, 'synthetic_split')
        center = est.ref_info['center']
        ref_poses = est.ref_info['poses']
        ref_Ks = est.ref_info['Ks']

        detect = est._jit_cache.setdefault('cal_det', est._detect_fn())
        errs = []
        B = 8
        for b0 in range(0, len(que_ids) - len(que_ids) % B, B):
            ids = que_ids[b0:b0 + B]
            imgs = jnp.asarray(np.stack(
                [db.get_image(i) for i in ids], 0).astype(np.float32) / 255.0)
            _, scales = detect(est.detector_params, imgs,
                               est.ref_info['det_ref_feats'])
            que_poses = jnp.asarray(np.stack([db.get_pose(i) for i in ids], 0))
            que_Ks = jnp.asarray(np.stack([db.get_K(i) for i in ids], 0))
            # GT scale vs the best-correlated normalized ref view (the
            # detector training GT definition, train/datasets.py det_batch)
            corr = view_correlation(que_poses, ref_poses, center)
            gt_ref = jnp.argmax(corr, 1)
            scale_gt, _ = scale_rotation_difference_from_cameras(
                ref_poses[gt_ref], que_poses, ref_Ks[gt_ref], que_Ks, center)
            errs.extend(np.log2(np.asarray(scales)) -
                        np.log2(np.asarray(scale_gt)))
        errs = np.asarray(errs)
        all_errs.append(errs)
        print(f'{scene}: n={len(errs)} median {np.median(errs):+.4f} '
              f'p90(|.|) {np.percentile(np.abs(errs), 90):.4f}')

    pooled = np.concatenate(all_errs)
    med = float(np.median(pooled))
    print(f'pooled: n={len(pooled)} median {med:+.4f} std {pooled.std():.4f}')
    print(f'recommended det_scale_correction: {-med:+.4f}')


if __name__ == '__main__':
    main()
