"""Measure whether a 2nd detection-score peak + selector confidence would
rescue the detector's center-error tail (docs/stage_diagnosis.md: p90=30 px
while p50=6.6 px — the tail is what caps both ADD-0.1d and prj-5 through bad
refine inits).

For each held-out query:
- decode the top-2 score peaks (5x5-cell NMS around peak 1);
- center error of each peak vs the GT-projected object center;
- the selector's max view logit for the crop at each peak (the candidate
  serving-time discrimination signal — no GT available at serving).

Reports how often peak 2 is the better hypothesis when peak 1 misses by
>10 px, and whether the selector logit picks the better peak.

Usage: JAX_PLATFORMS=cpu python scripts/probe_det_top2.py
       [--cfg configs/gen6d_synthetic.yaml] [--scene synthetic/128] [--n 16]
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
    ap.add_argument('--nms', type=int, default=2,
                    help='suppression radius in score cells around peak 1')
    ap.add_argument('--cpu', action='store_true',
                    help='force the CPU backend (the env re-forces '
                         'JAX_PLATFORMS=axon at interpreter startup, so a '
                         'shell-level override does not stick)')
    args = ap.parse_args()

    if args.cpu:
        os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from gen6d_tpu.data import database as dbm
    from gen6d_tpu.geometry.camera import project_points
    from gen6d_tpu.geometry import transform2d as t2d
    from gen6d_tpu.models.detector import POOL_RATIO
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
    center = jnp.asarray(dbm.get_object_center(db), jnp.float32)
    size = est.cfg['ref_resolution']

    @jax.jit
    def det_raw(params, que_imgs):
        return est.detector.apply(params, que_imgs,
                                  est.ref_info['det_ref_feats'],
                                  method='detect')

    @jax.jit
    def sel_top_logit(params, que_img, pos, scale):
        M = t2d.crop_transform_2d(pos, 1.0 / scale, 0.0, size)
        H = jnp.concatenate([M, jnp.asarray([[0.0, 0.0, 1.0]])], 0)
        crop = est._batch_warp(que_img[None], H[None], size,
                               est.cfg['warp_band_que'])
        logits, _ = est.selector.apply(est.selector_params, crop,
                                       est.ref_info['sel_feats'],
                                       est.ref_info['sel_pose_embed'],
                                       method='select')
        return jnp.max(logits[0])

    def decode_peak(out, yy, xx):
        off = np.asarray(out['select_pr_offset'])[0, yy, xx]
        pos = (np.array([xx, yy], np.float32) + off + 0.5) * POOL_RATIO - 0.5
        scl = 2.0 ** float(np.asarray(out['select_pr_scale'])[0, yy, xx, 0])
        scl *= 2.0 ** float(est.cfg.get('det_scale_correction') or 0.0)
        return pos, scl

    rows = []
    for qid in que_ids:
        img = db.get_image(qid)
        K, gt = db.get_K(qid), db.get_pose(qid)
        que = est._pad_queries(np.asarray(img)[None]).astype(np.float32) / 255.0
        out = det_raw(est.detector_params, jnp.asarray(que))
        smap = np.asarray(out['scores'])[0, :, :, 0]
        h, w = smap.shape
        i1 = int(np.argmax(smap))
        y1, x1 = i1 // w, i1 % w
        sup = smap.copy()
        r = args.nms
        sup[max(0, y1 - r):y1 + r + 1, max(0, x1 - r):x1 + r + 1] = -np.inf
        i2 = int(np.argmax(sup))
        y2, x2 = i2 // w, i2 % w

        pos_gt, _ = project_points(center[None], jnp.asarray(gt),
                                   jnp.asarray(K, jnp.float32))
        pos_gt = np.asarray(pos_gt[0])
        (p1, s1), (p2, s2) = decode_peak(out, y1, x1), decode_peak(out, y2, x2)
        e1 = float(np.linalg.norm(p1 - pos_gt))
        e2 = float(np.linalg.norm(p2 - pos_gt))
        l1 = float(sel_top_logit(est.selector_params, jnp.asarray(que[0]),
                                 jnp.asarray(p1), jnp.asarray(s1)))
        l2 = float(sel_top_logit(est.selector_params, jnp.asarray(que[0]),
                                 jnp.asarray(p2), jnp.asarray(s2)))
        sc1, sc2 = float(smap[y1, x1]), float(smap[y2, x2])
        rows.append((e1, e2, sc1, sc2, l1, l2))
        print(f'{qid}: e1={e1:6.1f} e2={e2:6.1f}  det {sc1:+.2f}/{sc2:+.2f}  '
              f'sel {l1:+.2f}/{l2:+.2f}', flush=True)

    rows = np.asarray(rows)
    e1, e2, _, _, l1, l2 = rows.T
    miss = e1 > 10.0
    print(f'\npeak1 center err: p50={np.median(e1):.1f} '
          f'p90={np.percentile(e1, 90):.1f}  (miss>10px: {miss.sum()}/{len(e1)})')
    if miss.any():
        better = (e2 < e1)[miss]
        print(f'when peak1 misses: peak2 better {better.sum()}/{miss.sum()}, '
              f'peak2 err p50={np.median(e2[miss]):.1f}')
    pick_l = np.where(l2 > l1, e2, e1)
    print(f'selector-logit pick: p50={np.median(pick_l):.1f} '
          f'p90={np.percentile(pick_l, 90):.1f} '
          f'(vs argmax p90={np.percentile(e1, 90):.1f})')
    oracle = np.minimum(e1, e2)
    print(f'top-2 oracle:        p50={np.median(oracle):.1f} '
          f'p90={np.percentile(oracle, 90):.1f}')


if __name__ == '__main__':
    main()
