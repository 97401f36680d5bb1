"""Cascade operating-point sweep on the held-out scene: (coarse iters,
refine_avg, polish iters, polish_avg) -> full-pipeline ADD-0.1d / Prj-5.

The round-5 cascade defaults were tuned against the round-4 detector's poor
inits (center p90 30 px); the pyramid detector's tight inits (p90 ~8 px) may
prefer fewer coarse iterations + more polish steps (the polish net is the
precision stage, docs/refiner_head_jitter.md). predict() runs refine
iterations in a host loop over per-iteration jitted programs, so every
variant reuses the same compiled programs — the sweep is compile-free after
the first query.

Usage: python scripts/sweep_cascade.py [--cfg configs/gen6d_r5p.yaml]
       [--scene synthetic/128] [--n 16] [--cpu]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (refine_iter, refine_polish_iter, refine_avg, polish_avg)
VARIANTS = [
    (5, 1, 3, 0),   # round-5 default (coarse 4 + avg3, polish 1)
    (4, 1, 3, 0),   # cheaper coarse
    (5, 2, 3, 2),   # coarse 3 + avg3, polish 2 + avg2
    (4, 2, 2, 2),   # coarse 2 + avg2, polish 2 + avg2
    (5, 3, 2, 3),   # coarse 2 + avg2, polish 3 + avg3
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cfg', default='configs/gen6d_r5p.yaml')
    ap.add_argument('--scene', default='synthetic/128')
    ap.add_argument('--n', type=int, default=16)
    ap.add_argument('--det_scale_correction', type=float, default=None,
                    help='override the config value (e.g. a freshly fitted one)')
    ap.add_argument('--variants', type=str, default=None,
                    help='semicolon list "ri,pi,ra,pa;..." overriding the '
                         'built-in VARIANTS (ri=total refine iters, pi=polish '
                         'iters, ra=refine_avg, pa=polish_avg)')
    ap.add_argument('--gt_init', action='store_true',
                    help='feed the GT pose as pose_init (tracking mode): '
                         'measures pure cascade convergence to the refiner '
                         'fixed point, no det/sel error')
    ap.add_argument('--cpu', action='store_true',
                    help='force the CPU backend (a sitecustomize re-forces '
                         'JAX_PLATFORMS=axon, so only the config value works)')
    args = ap.parse_args()

    if args.cpu:
        os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    from gen6d_tpu.data import database as dbm
    from gen6d_tpu.geometry.metrics import compute_metrics
    from gen6d_tpu.pipeline.loader import load_estimator
    from gen6d_tpu.utils.jit_cache import enable_persistent_cache
    enable_persistent_cache()

    est = load_estimator(args.cfg)
    if args.cpu:
        est.cfg['warp_method'] = 'gather'  # Pallas kernels are TPU-only
    if args.det_scale_correction is not None:
        est.cfg['det_scale_correction'] = args.det_scale_correction
    db = dbm.parse_database_name(args.scene)
    est.build(db, 'synthetic_split')
    _, que_ids = dbm.get_database_split(db, 'synthetic_split')
    que_ids = que_ids[:args.n]

    object_pts = dbm.get_ref_point_cloud(db)
    diameter = float(dbm.get_diameter(db))
    imgs = [np.asarray(db.get_image(q)) for q in que_ids]
    Ks = [np.asarray(db.get_K(q), np.float32) for q in que_ids]
    gts = [np.asarray(db.get_pose(q), np.float32) for q in que_ids]

    variants = VARIANTS
    if args.variants:
        variants = [tuple(int(x) for x in v.split(','))
                    for v in args.variants.split(';') if v.strip()]

    for (ri, pi, ra, pa) in variants:
        est.cfg['refine_iter'] = ri
        est.cfg['refine_polish_iter'] = pi
        est.cfg['refine_avg'] = ra
        est.cfg['polish_avg'] = pa
        poses = [np.asarray(est.predict(
                     im, K, pose_init=(gt if args.gt_init else None))[0])
                 for im, K, gt in zip(imgs, Ks, gts)]
        m = compute_metrics(object_pts, diameter, np.stack(gts),
                            np.stack(poses), np.stack(Ks))
        print(f'iter{ri - pi}+{pi} avg{ra}/{pa}: '
              f"add-0.1d={float(m['add-0.1d']):.3f} "
              f"prj-5={float(m['prj-5']):.3f} "
              f"obj_err={float(m['obj_err_mean']):.4f} "
              f"prj_err={float(m['prj_err_mean']):.2f}", flush=True)


if __name__ == '__main__':
    main()
