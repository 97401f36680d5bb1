"""Diagnose the GenMOP disk-eval failure (trained weights -> add-0.1d 0.0).

Per test query: GT-projected object center vs detector position, GT vs
detected scale, the selector's view choice, final pose error, and a GT-init
tracking pass (isolates det/sel failure from geometry/gauge bugs).

Usage: python scripts/debug_genmop_eval.py [--name r5evalobj] [--n 4] [--cpu]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--name', default='r5evalobj')
    ap.add_argument('--cfg', default='configs/gen6d_synthetic.yaml')
    ap.add_argument('--n', type=int, default=4)
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args()
    if args.cpu:
        os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')

    from gen6d_tpu.data import database as dbm
    from gen6d_tpu.geometry.camera import project_points
    from gen6d_tpu.geometry.metrics import compute_metrics
    from gen6d_tpu.pipeline.loader import load_estimator
    from gen6d_tpu.utils.jit_cache import enable_persistent_cache
    enable_persistent_cache()

    ref_db = dbm.parse_database_name(f'genmop/{args.name}-ref')
    que_db = dbm.parse_database_name(f'genmop/{args.name}-test')
    est = load_estimator(args.cfg)
    if args.cpu:
        est.cfg['warp_method'] = 'gather'
    est.build(ref_db, 'all')

    object_pts = np.asarray(dbm.get_ref_point_cloud(ref_db))
    diameter = float(dbm.get_diameter(ref_db))
    center = object_pts.mean(0)
    print(f'object diameter={diameter:.4f} center(ref gauge)={center}')

    _, que_ids = dbm.get_database_split(que_db, 'all')
    que_ids = que_ids[:args.n]
    for qid in que_ids:
        img = np.asarray(que_db.get_image(qid))
        K = np.asarray(que_db.get_K(qid), np.float32)
        gt = np.asarray(que_db.get_pose(qid), np.float32)
        c2d, cdep = project_points(center[None], gt, K)
        c2d, cdep = np.asarray(c2d)[0], float(np.asarray(cdep)[0])
        # GT scale in the detector's convention: object size in query px
        # relative to the 128px reference crop
        f = 0.5 * (K[0, 0] + K[1, 1])
        size_px = diameter * f / cdep
        pose_pr, inter = est.predict(img, K)
        m = compute_metrics(object_pts, diameter, gt[None], pose_pr[None],
                            K[None])
        pose_tr, _ = est.predict(img, K, pose_init=gt)
        mt = compute_metrics(object_pts, diameter, gt[None], pose_tr[None],
                             K[None])
        print(f'{qid}: gt_center2d=({c2d[0]:.0f},{c2d[1]:.0f}) '
              f"det=({inter['det_position'][0]:.0f},"
              f"{inter['det_position'][1]:.0f}) "
              f"gt_size_px={size_px:.0f} "
              f"det_scale_r2q={inter['det_scale_r2q']:.3f} "
              f"sel_idx={inter['sel_ref_idx']} "
              f"angle={np.degrees(inter['sel_angle_r2q']):.1f}deg | "
              f"full prj_err={float(m['prj_err_mean']):.1f}px "
              f"obj_err={float(m['obj_err_mean']):.3f} | "
              f"gt-init prj_err={float(mt['prj_err_mean']):.1f}px")


if __name__ == '__main__':
    main()
