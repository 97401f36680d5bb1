"""Render a synthetic object into the LINEMOD on-disk layout.

The environment ships no real LINEMOD data, but the LINEMOD code path
(reference dataset/database.py:56-105: JPEGImages/%06d.jpg, pose/pose{i}.npy,
mask/%04d.png, <obj>.ply, train.txt/test.txt, distance.txt) must be exercised
end-to-end — file IO, the native JPEG decoder, fixed-K 480x640 frames, split
parsing — not just through fixtures. This script writes a full-size
LINEMOD-format object directory from the procedural renderer so that

    python eval.py --object_name linemod/<name> --split_type linemod_test

runs the identical code path a real LINEMOD object would.

Usage: python scripts/make_linemod_synthetic.py [--name synthcube]
       [--n_views 128] [--shape cube] [--texture checks] [--root data/LINEMOD]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_ply(path, pts):
    """ASCII PLY with vertex positions only (what load_ply_vertices reads)."""
    with open(path, 'w') as f:
        f.write('ply\nformat ascii 1.0\n'
                f'element vertex {len(pts)}\n'
                'property float x\nproperty float y\nproperty float z\n'
                'end_header\n')
        for p in pts:
            f.write(f'{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--name', default='synthcube')
    ap.add_argument('--n_views', type=int, default=128)
    ap.add_argument('--shape', default='cube')
    ap.add_argument('--texture', default='checks')
    ap.add_argument('--seed', type=int, default=7)
    ap.add_argument('--root', default=None,
                    help='defaults to <GEN6D_DATA_ROOT>/LINEMOD')
    args = ap.parse_args()

    from PIL import Image
    from gen6d_tpu.data.database import LINEMOD_ROOT, LINEMODDatabase
    from gen6d_tpu.data.synthetic import SolidMesh, sphere_poses

    root = os.path.join(args.root or LINEMOD_ROOT, args.name)
    for sub in ('JPEGImages', 'pose', 'mask'):
        os.makedirs(os.path.join(root, sub), exist_ok=True)

    # LINEMOD intrinsics and frame size (reference dataset/database.py:58-60)
    K = LINEMODDatabase.K
    hw = (480, 640)
    mesh = SolidMesh(args.shape, args.texture, 1.0, args.seed)
    poses = sphere_poses(args.n_views, dist=3.3, seed=args.seed,
                         dist_jitter=0.5)

    for i, pose in enumerate(poses):
        img, mask = mesh.render(pose, K, hw)
        Image.fromarray(img).save(
            os.path.join(root, 'JPEGImages', f'{i:06}.jpg'), quality=92)
        np.save(os.path.join(root, 'pose', f'pose{i}.npy'),
                pose.astype(np.float32))
        Image.fromarray(
            np.repeat(mask[:, :, None].astype(np.uint8) * 255, 3, 2)).save(
            os.path.join(root, 'mask', f'{i:04}.png'))

    pts = mesh.point_cloud(4096, args.seed)
    write_ply(os.path.join(root, f'{args.name}.ply'), pts)
    # stale model cache from a previous generation would shadow the new ply
    cache = os.path.join(root, f'{args.name}.pkl')
    if os.path.exists(cache):
        os.remove(cache)

    # diameter convention: get_diameter reads distance.txt / 100
    diam = float(np.max(np.linalg.norm(pts[:, None] - pts[None], axis=-1)))
    with open(os.path.join(root, 'distance.txt'), 'w') as f:
        f.write(f'{diam * 100:.4f}\n')

    # splits in the reference's path-per-line format
    # (get_database_split parses int(basename))
    que = list(range(0, args.n_views, 4))
    ref = [i for i in range(args.n_views) if i not in set(que)]
    with open(os.path.join(root, 'test.txt'), 'w') as f:
        f.writelines(f'JPEGImages/{i:06}.jpg\n' for i in que)
    with open(os.path.join(root, 'train.txt'), 'w') as f:
        f.writelines(f'JPEGImages/{i:06}.jpg\n' for i in ref)

    print(f'wrote LINEMOD-format object at {root}: {args.n_views} views, '
          f'diameter {diam:.3f}, {len(ref)} refs / {len(que)} queries')


if __name__ == '__main__':
    main()
