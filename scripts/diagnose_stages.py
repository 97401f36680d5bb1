"""Per-stage accuracy diagnosis on the held-out scene (VERDICT r3 item 4:
locate where the projection error comes from before tuning).

For every held-out query it reports:
- detector: center error (px), log2-scale error vs the camera-derived GT;
- selector: angular gap between the chosen and best reference view, in-plane
  angle error (deg);
- pose-init: ADD-0.1d / Prj-5 / object-space err of the composed init;
- refiner: the same metrics after refine_iter iterations from (a) the real
  pipeline init, (b) the oracle det+sel init, (c) exact GT init (stability).

Writes docs/stage_diagnosis.md.

Usage: python scripts/diagnose_stages.py [--cfg configs/gen6d_synthetic.yaml]
       [--scene synthetic/128] [--n 16] [--out docs/stage_diagnosis.md]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cfg', default='configs/gen6d_synthetic.yaml')
    ap.add_argument('--scene', default='synthetic/128')
    ap.add_argument('--n', type=int, default=16)
    ap.add_argument('--out', default='docs/stage_diagnosis.md')
    ap.add_argument('--cpu', action='store_true',
                    help='force the CPU backend (a sitecustomize re-forces '
                         'JAX_PLATFORMS=axon, so only the config value works)')
    args = ap.parse_args()

    if args.cpu:
        os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from gen6d_tpu.data import database as dbm
    from gen6d_tpu.geometry.camera import project_points, view_correlation
    from gen6d_tpu.geometry.metrics import compute_metrics
    from gen6d_tpu.geometry.solvers import (
        scale_rotation_difference_from_cameras)
    from gen6d_tpu.pipeline.loader import load_estimator
    from gen6d_tpu.utils.jit_cache import enable_persistent_cache
    enable_persistent_cache()

    est = load_estimator(args.cfg)
    if args.cpu:
        est.cfg['warp_method'] = 'gather'  # Pallas kernels are TPU-only
    db = dbm.parse_database_name(args.scene)
    est.build(db, 'synthetic_split')
    _, que_ids = dbm.get_database_split(db, 'synthetic_split')
    que_ids = que_ids[:args.n]

    object_pts = dbm.get_ref_point_cloud(db)
    diameter = float(dbm.get_diameter(db))
    center = jnp.asarray(dbm.get_object_center(db), jnp.float32)
    ref_poses = est.ref_info['poses']
    ref_Ks = est.ref_info['Ks']

    rows = {k: [] for k in ('det_px', 'det_s', 'sel_gap', 'sel_ang')}
    poses = {k: [] for k in ('init', 'full', 'oracle', 'gt_stab')}
    gts, Ks = [], []
    for qid in que_ids:
        img = db.get_image(qid)
        K = db.get_K(qid)
        gt = db.get_pose(qid)
        gts.append(gt)
        Ks.append(K)

        pose_pr, inter = est.predict(img, K)
        poses['full'].append(pose_pr)
        poses['init'].append(np.asarray(inter['refine_poses'][0])
                             if len(inter.get('refine_poses', [])) else pose_pr)

        # GT quantities (the detector/selector training label math)
        corr = view_correlation(jnp.asarray(gt)[None], ref_poses, center)
        gt_idx = int(jnp.argmax(corr[0]))
        scale_gt, angle_gt = scale_rotation_difference_from_cameras(
            ref_poses[gt_idx][None], jnp.asarray(gt)[None],
            ref_Ks[gt_idx][None], jnp.asarray(K)[None], center)
        pos_gt, _ = project_points(center[None], jnp.asarray(gt),
                                   jnp.asarray(K))

        rows['det_px'].append(float(np.linalg.norm(
            np.asarray(inter['det_position']) - np.asarray(pos_gt[0]))))
        rows['det_s'].append(float(np.log2(inter['det_scale_r2q'])
                                   - np.log2(float(scale_gt[0]))))
        chosen = int(inter['sel_ref_idx'])
        rows['sel_gap'].append(float(np.degrees(
            np.arccos(np.clip(float(corr[0, chosen]), -1, 1)) -
            np.arccos(np.clip(float(corr[0, gt_idx]), -1, 1)))))
        # in-plane angle err vs the GT angle of the CHOSEN view
        _, angle_ch = scale_rotation_difference_from_cameras(
            ref_poses[chosen][None], jnp.asarray(gt)[None],
            ref_Ks[chosen][None], jnp.asarray(K)[None], center)
        d = np.degrees(float(inter['sel_angle_r2q']) - float(angle_ch[0]))
        rows['sel_ang'].append(abs((d + 180) % 360 - 180))

        # oracle det+sel init -> refine
        fn = est._get('pose_init', est._pose_init_fn)
        pose0 = np.asarray(fn(pos_gt[0], scale_gt[0], angle_gt[0], ref_poses,
                              ref_Ks, jnp.asarray(K), center, gt_idx))
        p_o, _ = est.predict(img, K, pose_init=pose0)
        poses['oracle'].append(p_o)
        # GT init stability
        p_g, _ = est.predict(img, K, pose_init=gt)
        poses['gt_stab'].append(p_g)

    gts_a = np.stack(gts)
    Ks_a = np.stack(Ks)
    lines = [f'# Stage diagnosis — {args.scene}, n={len(que_ids)}, '
             f"refine_iter={est.cfg['refine_iter']}", '']
    lines.append(f"detector: center err px p50={np.median(rows['det_px']):.1f} "
                 f"p90={np.percentile(rows['det_px'], 90):.1f}; "
                 f"log2-scale err mean={np.mean(rows['det_s']):+.3f} "
                 f"std={np.std(rows['det_s']):.3f}")
    lines.append(f"selector: view gap deg p50={np.median(rows['sel_gap']):.1f} "
                 f"p90={np.percentile(rows['sel_gap'], 90):.1f}; in-plane err "
                 f"deg p50={np.median(rows['sel_ang']):.1f} "
                 f"p90={np.percentile(rows['sel_ang'], 90):.1f}")
    lines.append('')
    lines.append('| pipeline variant | ADD-0.1d | Prj-5 | obj err mean | prj err mean |')
    lines.append('|---|---|---|---|---|')
    for name, label in (('init', 'pose-init only (no refine)'),
                        ('full', 'full pipeline'),
                        ('oracle', 'oracle det+sel init + refine'),
                        ('gt_stab', 'GT init + refine (stability)')):
        m = compute_metrics(object_pts, diameter, gts_a,
                            np.stack(poses[name]), Ks_a)
        lines.append(f"| {label} | {float(m['add-0.1d']):.3f} | "
                     f"{float(m['prj-5']):.3f} | {m['obj_err_mean']:.4f} | "
                     f"{m['prj_err_mean']:.2f} |")
    text = '\n'.join(lines)
    print(text)
    if args.out:
        with open(args.out, 'w') as f:
            f.write(text + '\n')


if __name__ == '__main__':
    main()
