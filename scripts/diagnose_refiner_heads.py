"""Per-head refiner jitter diagnosis (VERDICT r4 item 1a).

At a ground-truth pose the refiner's correct output is the identity
similarity; any deviation is head noise. The refine crop geometry is
re-parameterized per iteration (the crop follows the pose estimate), so we
probe with K *dithered* crops per query — tiny in-plane offset / rotation /
scale perturbations of the look-at crop, which leave the GT update exactly
identity (the crop camera algebra is consistent) but shift the pixel grid
the way successive refine iterations do.

Per head (rotation / offset / scale) this separates
- within-query std over dithers  = crop-grid aliasing noise (averagable by
  TTA / refine_avg, not trainable away at fixed feature stride), from
- across-query std of dither-means = query-conditional error (trainable),
and converts each to its projection-error contribution in query pixels by
re-composing the pose with the other heads forced to identity.

Matches the decomposition the reference's refiner_loss implicitly weights
(reference network/loss.py:144-193); diagnosis only, no reference analogue.

Usage: python scripts/diagnose_refiner_heads.py
         [--cfg configs/gen6d_synthetic.yaml] [--scene synthetic/128]
         [--n 16] [--k 8] [--out docs/refiner_head_jitter.md]
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
    ap.add_argument('--k', type=int, default=8)
    ap.add_argument('--chunk', type=int, default=16)
    ap.add_argument('--pos_dither', type=float, default=1.5,
                    help='crop-center dither std, query px')
    ap.add_argument('--angle_dither', type=float, default=10.0,
                    help='in-plane crop angle dither, +-deg uniform')
    ap.add_argument('--scale_dither', type=float, default=0.05,
                    help='crop scale dither, +-log2 uniform')
    ap.add_argument('--out', default='docs/refiner_head_jitter.md')
    ap.add_argument('--polish', action='store_true',
                    help='probe the cascade polish net (cfg refiner_polish) '
                         'instead of the coarse refiner')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from gen6d_tpu.data import database as dbm
    from gen6d_tpu.data.ref_prep import (look_at_crop_transform,
                                         reference_crop_transforms)
    from gen6d_tpu.geometry.camera import (let_me_look_at, project_points,
                                           view_correlation)
    from gen6d_tpu.geometry.pose import (camera_position, denormalize_pose,
                                         normalize_pose, pose_compose,
                                         pose_inverse)
    from gen6d_tpu.geometry.rotations import quat_to_mat
    from gen6d_tpu.geometry.solvers import (compose_sim_pose,
                                            pose_sim_to_pose_rigid)
    from gen6d_tpu.pipeline.loader import load_estimator
    from gen6d_tpu.utils.jit_cache import enable_persistent_cache
    enable_persistent_cache()

    est = load_estimator(args.cfg)
    assert est.refiner is not None
    if args.polish:
        assert est.refiner_polish is not None, (
            f'{args.cfg} has no refiner_polish stage')
        est.refiner = est.refiner_polish
        est.refiner_params = est.refiner_polish_params
    db = dbm.parse_database_name(args.scene)
    est.build(db, 'synthetic_split')
    ref = est.ref_info
    _, que_ids = dbm.get_database_split(db, 'synthetic_split')
    que_ids = que_ids[:args.n]

    object_pts = jnp.asarray(np.asarray(dbm.get_ref_point_cloud(db),
                                        np.float32))
    size = est.cfg['refine_size']
    margin = est.cfg['refine_margin']
    ref_num = est.cfg['refine_ref_num']

    def heads_and_poses(params, que_img, que_K, gt_pose, dpos, dangle, dlogs,
                        ref_imgs, ref_poses, ref_Ks, ns, no):
        """One (query, dither): raw heads + composed poses for head ablations.

        Returns dict with scale/quat/offset and the prj errors (query px,
        vs GT projection of the object points) of: full composition, each
        single head alone (others identity)."""
        center = jnp.zeros(3)
        diameter = 2.0
        in_pose = normalize_pose(gt_pose, ns, no)
        _, new_f = let_me_look_at(in_pose, que_K, center)
        in_dist = jnp.linalg.norm(camera_position(in_pose) - center)
        in_f = size * (1 - margin) / diameter * in_dist
        scale = in_f / new_f * (2.0 ** dlogs)
        position, _ = project_points(center[None], in_pose, que_K)
        H_que, que_K_warp, in_pose_warp, que_pose_rect = \
            look_at_crop_transform(que_K, in_pose, position[0] + dpos,
                                   dangle, scale, size, size)

        corr = view_correlation(in_pose_warp[None], ref_poses, center)[0]
        _, top_idx = jax.lax.top_k(corr, ref_num)
        Hs_ref, ref_K_new, ref_pose_new, _ = reference_crop_transforms(
            ref_poses[top_idx], ref_Ks[top_idx], center, diameter, size,
            margin, input_pose=in_pose_warp, input_K=que_K_warp)

        que_warp = est._batch_warp(que_img[None], H_que[None], size,
                                   est.cfg['warp_band_que'])
        sel = ref_imgs[top_idx]
        if sel.dtype == jnp.uint8:
            sel = sel.astype(jnp.float32) / 255.0
        ref_crops = est._batch_warp(sel, Hs_ref, size,
                                    est.cfg['warp_band_ref'])[None]
        out = est.refiner.apply(params, que_warp, que_K_warp[None],
                                in_pose_warp[None], ref_crops,
                                ref_pose_new[None], ref_K_new[None])
        quat = out['rotation'][0]
        offset = out['offset'][0]
        slog = out['scale'][0, 0]

        ident_q = jnp.asarray([1.0, 0.0, 0.0, 0.0])
        zero_o = jnp.zeros(2)

        def compose(q, o, s):
            pose_sim = compose_sim_pose(2.0 ** s, q, o, in_pose_warp, center)
            pose_pr = pose_sim_to_pose_rigid(pose_sim, in_pose_warp,
                                             que_K_warp, que_K_warp, center)
            pose_pr = pose_compose(pose_pr, pose_inverse(que_pose_rect))
            return denormalize_pose(pose_pr, ns, no)

        gt2d, _ = project_points(object_pts, gt_pose, que_K)

        def prj_err(pose_pr):
            p2d, _ = project_points(object_pts, pose_pr, que_K)
            return jnp.mean(jnp.linalg.norm(p2d - gt2d, axis=-1))

        return {
            'scale': slog, 'quat': quat, 'offset': offset,
            'in_dist': in_dist, 'f_warp': que_K_warp[0, 0],
            'prj_full': prj_err(compose(quat, offset, slog)),
            'prj_rot': prj_err(compose(quat, zero_o, 0.0)),
            'prj_off': prj_err(compose(ident_q, offset, 0.0)),
            'prj_scl': prj_err(compose(ident_q, zero_o, slog)),
        }

    fwd = jax.jit(jax.vmap(heads_and_poses,
                           in_axes=(None, 0, 0, 0, 0, 0, 0, None, None, None,
                                    None, None)))

    rng = np.random.default_rng(0)
    n, k = len(que_ids), args.k
    dpos = rng.normal(0, args.pos_dither, (n, k, 2)).astype(np.float32)
    dang = np.deg2rad(rng.uniform(-args.angle_dither, args.angle_dither,
                                  (n, k))).astype(np.float32)
    dlog = rng.uniform(-args.scale_dither, args.scale_dither,
                       (n, k)).astype(np.float32)
    # dither 0 is the undithered crop (the production operating point)
    dpos[:, 0] = 0.0
    dang[:, 0] = 0.0
    dlog[:, 0] = 0.0

    results = []
    flat = []
    for qi, qid in enumerate(que_ids):
        img = jnp.asarray(np.asarray(db.get_image(qid), np.float32) / 255.0)
        K = jnp.asarray(db.get_K(qid), jnp.float32)
        gt = jnp.asarray(db.get_pose(qid), jnp.float32)
        for di in range(k):
            flat.append((img, K, gt, dpos[qi, di], dang[qi, di],
                         dlog[qi, di]))
    for i in range(0, len(flat), args.chunk):
        ch = flat[i:i + args.chunk]
        batch = [jnp.stack([c[j] for c in ch]) for j in range(6)]
        out = fwd(est.refiner_params, *batch, ref['refine_imgs'],
                  ref['refine_poses'], ref['refine_Ks'], ref['norm_scale'],
                  ref['norm_offset'])
        results.append(jax.tree.map(np.asarray, out))
    res = {kk: np.concatenate([r[kk] for r in results]).reshape(
        (n, k) + results[0][kk].shape[1:]) for kk in results[0]}

    # head stats
    q = res['quat'] / np.linalg.norm(res['quat'], axis=-1, keepdims=True)
    q[q[..., 0] < 0] *= -1
    ang = 2 * np.degrees(np.arccos(np.clip(q[..., 0], -1, 1)))  # n,k deg
    off_px = res['offset'] * (size * (1 - margin) / 2.0)  # crop px (f/z)
    scl = res['scale']  # n,k log2

    def split_var(x):
        """x: (n,k[,d]) -> (within-query std over dithers,
        across-query std of dither means, overall mean)."""
        x = x.reshape(n, k, -1)
        within = float(np.mean(np.std(x, axis=1)))
        means = np.mean(x, axis=1)
        across = float(np.mean(np.std(means, axis=0)))
        return within, across, float(np.mean(means))

    lines = [f'# Refiner head jitter — {args.scene}, n={n}, k={k} dithers '
             f'(pos±{args.pos_dither}px, angle±{args.angle_dither}°, '
             f'scale±{args.scale_dither} log2)', '',
             '| head | within-query std (aliasing) | across-query std '
             '(conditional) | mean bias |', '|---|---|---|---|']
    w, a, m = split_var(ang[..., None])
    lines.append(f'| rotation (deg) | {w:.3f} | {a:.3f} | {m:.3f} |')
    w, a, m = split_var(off_px)
    lines.append(f'| offset (crop px) | {w:.3f} | {a:.3f} | {m:.3f} |')
    w, a, m = split_var(scl[..., None])
    lines.append(f'| scale (log2) | {w:.4f} | {a:.4f} | {m:+.4f} |')
    lines.append('')
    lines.append('Projection error (query px, mean over object points) from a'
                 ' GT input pose, per composition:')
    lines.append('')
    lines.append('| composition | prj err p50 | mean | p90 |')
    lines.append('|---|---|---|---|')
    for key, label in (('prj_full', 'all heads'),
                       ('prj_rot', 'rotation head only'),
                       ('prj_off', 'offset head only'),
                       ('prj_scl', 'scale head only')):
        v = res[key].ravel()
        lines.append(f'| {label} | {np.median(v):.2f} | {np.mean(v):.2f} | '
                     f'{np.percentile(v, 90):.2f} |')
    # TTA bound: per-query mean of dither poses' 2D projections ~ averaging
    # the head outputs; approximate by the prj error of the dither-mean heads
    lines.append('')
    lines.append(f'undithered (production crop, dither 0) full prj err: '
                 f"p50 {np.median(res['prj_full'][:, 0]):.2f} "
                 f"mean {np.mean(res['prj_full'][:, 0]):.2f}")
    text = '\n'.join(lines)
    print(text)
    if args.out:
        with open(args.out, 'w') as f:
            f.write(text + '\n')


if __name__ == '__main__':
    main()
