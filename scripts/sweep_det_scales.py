"""Detection operating-point sweep: IoU vs object scale, 3 vs 4 query scales.

The production configs prune the reference's 4th detection scale (+0.5,
reference network/detector.py:141) as a perf tradeoff. This sweep validates
(or refutes) that choice on the trained detector: queries are rendered with
the object at apparent scales 2^[-1.2, 1.2] relative to the normalized
reference crop (the detector's training prior is 2^[-0.5, 1.2], reference
train_dataset.py:438; the query-scale sweep in detect_impl is what extends
coverage below it), and mean detection IoU is reported per scale for both
detection_scales settings. Writes docs/det_scale_sweep.md.

Usage: python scripts/sweep_det_scales.py [--cfg configs/gen6d_synthetic.yaml]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cfg', default='configs/gen6d_synthetic.yaml')
    ap.add_argument('--qn', type=int, default=16)
    ap.add_argument('--out', default='docs/det_scale_sweep.md')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from gen6d_tpu.data import database as D
    from gen6d_tpu.data.synthetic import SyntheticScene
    from gen6d_tpu.geometry.camera import let_me_look_at, project_points
    from gen6d_tpu.geometry.pose import camera_position
    from gen6d_tpu.models.detector import parse_detection
    from gen6d_tpu.pipeline.loader import load_estimator
    from gen6d_tpu.train.metrics import detection_iou
    from gen6d_tpu.utils.jit_cache import enable_persistent_cache
    enable_persistent_cache()

    est = load_estimator(args.cfg)
    # references: the bench object's ref half (held-out protocol as bench.py)
    db = D.parse_database_name('synthetic/128')
    est.build(db, 'synthetic_split')
    size = est.cfg['ref_resolution']
    margin = 0.05  # build-time reference normalization margin
    diameter = db.scene.diameter
    corr = 2.0 ** float(est.cfg.get('det_scale_correction', 0.0))

    from gen6d_tpu.models.detector import Detector
    base_cfg = dict(est.detector.cfg or {})

    sweep = 2.0 ** np.linspace(-1.2, 1.2, 13)
    rows = {}
    for tag, scales_cfg in (('3-scale (-1,-0.5,0)', (-1.0, -0.5, 0.0)),
                            ('4-scale (+0.5)', (-1.0, -0.5, 0.0, 0.5))):
        det_mod = Detector({**base_cfg, 'detection_scales': scales_cfg})
        det_params = est.detector_params
        n_tr = len(base_cfg.get('detection_scales', (-1.0, -0.5, 0.0)))
        if len(scales_cfg) != n_tr:
            # the fusion Dense consumes scale-major/level-minor inputs
            # (3 per scale): the trained 3-scale kernel is weight-expanded
            # by copying the 0.0-scale rows into the +0.5 slots — the
            # 4-scale variant cannot be a pure config flip on from-scratch
            # 3-scale weights (reference detector.py:141 trained with 4)
            import jax as _jax
            det_params = _jax.tree.map(lambda x: x, est.detector_params)
            p = {k: dict(v) if isinstance(v, dict) else v
                 for k, v in det_params['params'].items()}
            k0 = np.asarray(p['score_conv0']['kernel'])  # (n_tr*3, 64)
            rows0 = k0[(n_tr - 1) * 3:n_tr * 3]
            p['score_conv0'] = dict(p['score_conv0'],
                                    kernel=jnp.asarray(
                                        np.concatenate([k0, rows0], 0)))
            det_params = {'params': p}
        det_fn = jax.jit(lambda p, q, rf, m=det_mod: m.apply(
            p, q, rf, method='detect'))
        ious = []
        for s in sweep:
            # apparent scale ~ 1/dist: dist so the object appears at s x the
            # normalized reference crop size
            scene = SyntheticScene(n_views=args.qn, dist=3.3 / s, seed=11,
                                   dist_jitter=0.0)
            imgs = np.stack([scene.render(i)[0] for i in range(args.qn)], 0)
            que = jnp.asarray(imgs.astype(np.float32) / 255.0)
            out = det_fn(det_params, que,
                         est.ref_info['det_ref_feats'])
            pos, scl = parse_detection(out['scores'], out['select_pr_scale'],
                                       out['select_pr_offset'])
            scl = scl * corr
            cens_gt, scale_gt = [], []
            for i in range(args.qn):
                pose = scene.poses[i]
                K = scene.K
                cen, _ = project_points(np.zeros((1, 3), np.float32), pose, K)
                dist = float(np.linalg.norm(
                    np.asarray(camera_position(jnp.asarray(pose)))))
                f_look = float(let_me_look_at(jnp.asarray(pose),
                                              jnp.asarray(K),
                                              jnp.zeros(3))[1])
                # GT scale: query apparent size / normalized-crop size
                # (same formula as the training GT, train/datasets.py:338)
                scale_gt.append(f_look * diameter /
                                (size * (1 - margin) * dist))
                cens_gt.append(np.asarray(cen)[0])
            iou = detection_iou(pos, scl, jnp.asarray(np.stack(cens_gt)),
                                jnp.asarray(np.asarray(scale_gt)))
            ious.append(float(jnp.mean(iou)))
            print(f'{tag} scale {s:.3f}: IoU {ious[-1]:.3f}', flush=True)
        rows[tag] = ious

    with open(args.out, 'w') as f:
        f.write('# Detection IoU vs object scale: 3 vs 4 query scales\n\n'
                'Mean detection IoU on the trained detector over queries '
                'rendered with the\nobject at the given apparent scale '
                '(relative to the normalized 128px\nreference crop). '
                'Produced by scripts/sweep_det_scales.py.\n\n'
                '| object scale | ' + ' | '.join(rows) + ' |\n'
                '|---|' + '---|' * len(rows) + '\n')
        for i, s in enumerate(sweep):
            f.write(f'| 2^{np.log2(s):+.2f} ({s:.2f}) | ' +
                    ' | '.join(f'{rows[t][i]:.3f}' for t in rows) + ' |\n')
    print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
