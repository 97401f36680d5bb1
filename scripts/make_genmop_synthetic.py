"""Render a synthetic object into the GenMOP on-disk layout.

The environment ships no real GenMOP data, but the GenMOP code path
(reference dataset/database.py:109-237: per-sequence images/ +
images_fn_cache.pkl + COLMAP binary sparse model, <obj>-ref meta_info +
object_point_cloud.ply, <obj>-test align.pkl with (scale_ratio,
transfer_pose)) must be exercised end-to-end — COLMAP binary IO, SfM-frame
gauge handling, the test->ref sequence alignment, gravity normalization —
not just through fixtures.

Each sequence gets its own arbitrary SfM gauge (rotation Q, scale s,
offset c: x_sfm = s*Q@x_world + c), exactly the ambiguity a real COLMAP
reconstruction has; align.pkl carries the analytically-derived test->ref
alignment the reference's compute_align_poses.py would estimate from
hand-labeled keypoints. The script self-checks: loaded test-sequence GT
poses must reproject the object identically to the renderer's poses.

Usage: python scripts/make_genmop_synthetic.py [--name pytestobj]
       [--n_ref 48] [--n_test 16] [--seed 5]
"""
import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.make_linemod_synthetic import write_ply  # noqa: E402


def random_rotation(rng):
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q


def write_sequence(root, seq, imgs_meta, K, hw):
    """Write images/, images_fn_cache.pkl, and the COLMAP sparse model for
    one sequence. ``imgs_meta``: list of (img uint8, pose_sfm [3,4])."""
    from PIL import Image
    from gen6d_tpu.data import colmap as cm

    seq_dir = os.path.join(root, seq)
    img_dir = os.path.join(seq_dir, 'images')
    os.makedirs(img_dir, exist_ok=True)
    fns = []
    cams = {1: cm.Camera(1, 'PINHOLE', hw[1], hw[0],
                         np.array([K[0, 0], K[1, 1], K[0, 2], K[1, 2]],
                                  np.float64))}
    images = {}
    for i, (img, pose) in enumerate(imgs_meta):
        fn = f'{i}.jpg'
        fns.append(fn)
        Image.fromarray(img).save(os.path.join(img_dir, fn), quality=92)
        images[i + 1] = cm.Image(i + 1, cm.rotmat2qvec(pose[:, :3]),
                                 pose[:, 3].astype(np.float64), 1, fn)
    with open(os.path.join(seq_dir, 'images_fn_cache.pkl'), 'wb') as f:
        pickle.dump(fns, f)
    sparse = os.path.join(seq_dir, 'colmap-all',
                          'colmap_default-colmap_default', 'sparse', '0')
    cm.write_model(cams, images, None, sparse)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--name', default='pytestobj')
    ap.add_argument('--n_ref', type=int, default=48)
    ap.add_argument('--n_test', type=int, default=16)
    ap.add_argument('--shape', default='prism')
    ap.add_argument('--texture', default='blobs')
    ap.add_argument('--seed', type=int, default=5)
    ap.add_argument('--root', default=None,
                    help='defaults to <GEN6D_DATA_ROOT>/GenMOP')
    args = ap.parse_args()

    from gen6d_tpu.data.database import GENMOP_ROOT
    from gen6d_tpu.data.synthetic import SolidMesh, sphere_poses

    root = args.root or GENMOP_ROOT
    rng = np.random.RandomState(args.seed)
    hw = (480, 640)
    K = np.array([[550.0, 0, 320], [0, 550, 240], [0, 0, 1]], np.float32)

    mesh = SolidMesh(args.shape, args.texture, 1.0, args.seed)
    # per-sequence SfM gauges: x_sfm = s*Q@x_w + c
    gauges = {'ref': (1.0 + rng.rand(), random_rotation(rng),
                      rng.randn(3) * 0.3),
              'test': (1.0 + rng.rand(), random_rotation(rng),
                       rng.randn(3) * 0.3)}

    seq_poses = {}
    for kind, n, dseed in (('ref', args.n_ref, 0), ('test', args.n_test, 1)):
        s, Q, c = gauges[kind]
        poses_w = sphere_poses(n, dist=3.2, seed=args.seed + dseed,
                               dist_jitter=0.4)
        metas = []
        for pose in poses_w:
            img, _ = mesh.render(pose, K, hw)
            # COLMAP pose in the scaled/rotated/offset SfM frame:
            # x_cam_sfm = s*x_cam_w = R@x_sfm + t with R = R_w Q^T,
            # t = s*t_w - R@c
            R = pose[:, :3] @ Q.T
            t = s * pose[:, 3] - R @ c
            metas.append((img, np.concatenate([R, t[:, None]], 1)))
        write_sequence(root, f'{args.name}-{kind}', metas, K, hw)
        seq_poses[kind] = poses_w

    # ref-sequence extras: object point cloud (in the ref SfM frame) and
    # gravity/forward meta (any non-degenerate pair; expressed in ref frame)
    s1, Q1, c1 = gauges['ref']
    pts_w = mesh.point_cloud(2048, args.seed)
    ref_dir = os.path.join(root, f'{args.name}-ref')
    write_ply(os.path.join(ref_dir, 'object_point_cloud.ply'),
              pts_w @ (s1 * Q1).T + c1)
    gravity = Q1 @ np.array([0.0, 0.0, -1.0])
    forward = Q1 @ np.array([1.0, 0.0, 0.0])
    np.savetxt(os.path.join(ref_dir, 'meta_info.txt'),
               np.stack([gravity, forward], 0))

    # analytic test->ref alignment (what compute_align_poses.py estimates):
    # scale_ratio = s_ref/s_test; transfer = [Q2@Q1^T | c2 - (s2/s1)Q2Q1^T c1]
    s2, Q2, c2 = gauges['test']
    R_tr = Q2 @ Q1.T
    t_tr = c2 - (s2 / s1) * R_tr @ c1
    align = (s1 / s2,
             np.concatenate([R_tr, t_tr[:, None]], 1).astype(np.float32))
    with open(os.path.join(root, f'{args.name}-test', 'align.pkl'), 'wb') as f:
        pickle.dump(align, f)

    # self-check: the loaded test DB must agree with the renderer GT. The
    # normalized test pose applied to normalized object points must project
    # to the same pixels as (renderer pose, world points).
    from gen6d_tpu.data import database as dbm
    db = dbm.parse_database_name(f'genmop/{args.name}-test')
    meta = db.meta_info
    norm_pts = meta.object_point_cloud  # ref SfM frame, gravity-normalized
    worst = 0.0
    for i, img_id in enumerate(db.get_img_ids()):
        pose = db.get_pose(img_id)
        cam = norm_pts @ pose[:, :3].T + pose[:, 3]
        uv = cam @ K.T
        uv = uv[:, :2] / uv[:, 2:]
        # renderer GT: same world points through the renderer pose. The meta
        # normalization scales the frame by meta.scale_ratio*s1 relative to
        # world, which cancels in the projection.
        pw = pts_w @ (s1 * Q1).T + c1
        pw = (pw @ meta.rotation.T) * meta.scale_ratio
        cam_gt = (pts_w @ seq_poses['test'][i][:, :3].T +
                  seq_poses['test'][i][:, 3])
        uv_gt = cam_gt @ K.T
        uv_gt = uv_gt[:, :2] / uv_gt[:, 2:]
        worst = max(worst, float(np.max(np.abs(uv - uv_gt))))
    assert worst < 0.1, f'alignment self-check failed: {worst:.3f}px'
    print(f'wrote GenMOP-format object at {root}/{args.name}-(ref|test): '
          f'{args.n_ref}+{args.n_test} views, alignment err {worst:.2e}px')


if __name__ == '__main__':
    main()
