"""A/B the refine-iterate averaging (cfg refine_avg) and iteration count on
the held-out synthetic queries (VERDICT r3 item 4: prj-5 is bound by the
refiner's per-iteration jitter — docs/stage_diagnosis.md measures ~6 px drift
even from GT init, so averaging the last-k iterates should cut the variance
~sqrt(k)).

For each (refine_iter, refine_avg) it runs the fused serving program over the
held-out split and reports ADD-0.1d / Prj-5 / mean errors + per-batch wall
time.

Usage: python scripts/sweep_refine_avg.py [--cfg configs/gen6d_synthetic.yaml]
       [--scene synthetic/128] [--n 32] [--grid 3:0,3:3,5:0,5:3]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cfg', default='configs/gen6d_synthetic.yaml')
    ap.add_argument('--scene', default='synthetic/128')
    ap.add_argument('--n', type=int, default=32)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--grid', default='3:0,3:3,5:0,5:3')
    args = ap.parse_args()

    from gen6d_tpu.utils.jit_cache import enable_persistent_cache
    enable_persistent_cache()
    from gen6d_tpu.data import database as dbm
    from gen6d_tpu.geometry.metrics import compute_metrics
    from gen6d_tpu.pipeline.loader import load_estimator

    est = load_estimator(args.cfg)
    db = dbm.parse_database_name(args.scene)
    est.build(db, 'synthetic_split')
    _, que_ids = dbm.get_database_split(db, 'synthetic_split')
    que_ids = que_ids[:args.n]
    imgs = np.stack([db.get_image(i) for i in que_ids], 0)
    Ks = np.stack([db.get_K(i) for i in que_ids], 0).astype(np.float32)
    pose_gt = np.stack([db.get_pose(i) for i in que_ids], 0)
    object_pts = dbm.get_ref_point_cloud(db)
    diam = dbm.get_diameter(db)

    results = []
    for pair in args.grid.split(','):
        parts = [int(v) for v in pair.split(':')]
        it, avg = parts[0], parts[1]
        pol = parts[2] if len(parts) > 2 else None  # it:avg:polish:polish_avg
        est.cfg['refine_iter'] = it
        est.cfg['refine_avg'] = avg
        if pol is not None:
            est.cfg['refine_polish_iter'] = pol
        if len(parts) > 3:
            est.cfg['polish_avg'] = parts[3]
        est._jit_cache.pop('fused', None)  # cfg is baked into the program
        t0 = time.time()
        poses = []
        for b in range(0, len(imgs), args.batch):
            poses.append(est.predict_batch(imgs[b:b + args.batch],
                                           Ks[b:b + args.batch]))
        compile_and_run_s = time.time() - t0
        poses = np.concatenate(poses, 0)
        t0 = time.time()
        est.predict_batch(imgs[:args.batch], Ks[:args.batch])
        batch_s = time.time() - t0
        m = compute_metrics(object_pts, diam, pose_gt, poses, Ks)
        # per-query projection errors: percentiles show whether prj-5 is a
        # variance problem (median near 5px) or a bias/outlier problem
        import jax
        from gen6d_tpu.geometry.metrics import pose_errors
        import jax.numpy as jnp
        prj_errs, _, _ = jax.vmap(pose_errors, in_axes=(None, 0, 0, 0))(
            jnp.asarray(object_pts, jnp.float32), jnp.asarray(poses),
            jnp.asarray(pose_gt), jnp.asarray(Ks, jnp.float32))
        prj_errs = np.asarray(prj_errs)
        row = {'refine_iter': it, 'refine_avg': avg,
               'polish_iter': est.cfg.get('refine_polish_iter', 0),
               'polish_avg': est.cfg.get('polish_avg', 0),
               'prj_p50': round(float(np.percentile(prj_errs, 50)), 2),
               'prj_p75': round(float(np.percentile(prj_errs, 75)), 2),
               'prj_p90': round(float(np.percentile(prj_errs, 90)), 2),
               'add-0.1d': round(float(m['add-0.1d']), 4),
               'prj-5': round(float(m['prj-5']), 4),
               'obj_err': round(float(m['obj_err_mean']), 4),
               'prj_err': round(float(m['prj_err_mean']), 3),
               'batch_s': round(batch_s, 3),
               'first_pass_s': round(compile_and_run_s, 1)}
        print(json.dumps(row), flush=True)
        results.append(row)

    print('\n| iter | avg | ADD-0.1d | Prj-5 | obj err | prj err px | batch s |')
    print('|---|---|---|---|---|---|---|')
    for r in results:
        print(f"| {r['refine_iter']} | {r['refine_avg']} | {r['add-0.1d']} | "
              f"{r['prj-5']} | {r['obj_err']} | {r['prj_err']} | "
              f"{r['batch_s']} |")


if __name__ == '__main__':
    main()
