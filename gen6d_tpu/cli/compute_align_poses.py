"""GenMOP test-to-ref sequence alignment from hand-labeled keypoints (port of
reference compute_align_poses.py:17-109): triangulate matched keypoints on two
frames of each sequence, then Procrustes/Umeyama SVD -> (scale, transfer_pose)
saved as align.pkl and consumed by GenMOPDatabase.
"""
import argparse
import os
import pickle
import xml.etree.cElementTree as ET
from pathlib import Path

import numpy as np

from gen6d_tpu.data.colmap import read_model
from gen6d_tpu.data.database import (GENMOP_ROOT, BaseDatabase,
                                     parse_colmap_project, read_pickle)


def triangulate_pair(kps0, kps1, pose0, pose1, K0, K1):
    """Two-view DLT triangulation (replaces cv2.triangulatePoints; reference
    utils/base_utils.py:588-594)."""
    k0 = np.concatenate([kps0, np.ones([len(kps0), 1])], 1) @ np.linalg.inv(K0).T
    k1 = np.concatenate([kps1, np.ones([len(kps1), 1])], 1) @ np.linalg.inv(K1).T
    pts = []
    for a, b in zip(k0[:, :2], k1[:, :2]):
        # DLT rows: x*(P3) - P1, y*(P3) - P2 for each view
        A = np.stack([
            a[0] * pose0[2] - pose0[0],
            a[1] * pose0[2] - pose0[1],
            b[0] * pose1[2] - pose1[0],
            b[1] * pose1[2] - pose1[1],
        ], 0)
        # poses are [3,4]; homogeneous solution via SVD
        _, _, Vt = np.linalg.svd(A)
        X = Vt[-1]
        pts.append(X[:3] / X[3])
    return np.asarray(pts)


class GenMOPCOLMAPDatabase(BaseDatabase):
    """Raw (un-aligned) COLMAP sequence (reference compute_align_poses.py:26-52)."""

    def __init__(self, database_name):
        super().__init__(database_name)
        _, seq_name = database_name.split('/')
        self.seq_name = seq_name
        self.root = Path(GENMOP_ROOT) / seq_name
        self.img_fns = read_pickle(str(self.root / 'images_fn_cache.pkl'))
        cameras, images, _ = read_model(
            f'{GENMOP_ROOT}/{seq_name}/colmap-all/colmap_default-colmap_default/sparse/0')
        self.poses, self.Ks, self.img_ids = parse_colmap_project(
            cameras, images, self.img_fns)

    def get_image(self, img_id):
        from gen6d_tpu.data.database import imread
        return imread(str(self.root / 'images' / self.img_fns[int(img_id)]))

    def get_K(self, img_id):
        return self.Ks[img_id].copy()

    def get_pose(self, img_id):
        return self.poses[img_id].copy()

    def get_img_ids(self):
        return self.img_ids


def parse_fad(fn):
    """Keypoint annotation file (reference compute_align_poses.py:54-63)."""
    root = ET.ElementTree(file=fn).getroot()
    return [(int(f.attrib['x']), int(f.attrib['y'])) for f in root[0][0][0]]


def load_annotations(input_dir):
    test_anno, ref_anno = [], []
    for fn in sorted(os.listdir(input_dir)):
        name = fn.split('-')[1]
        kps = parse_fad(f'{input_dir}/{fn}')
        if fn.startswith(('test', 'set')):
            test_anno.append({'name': name + '.jpg', 'kps': kps})
        elif fn.startswith('ref'):
            ref_anno.append({'name': name + '.jpg', 'kps': kps})
    assert len(ref_anno) == 2 and len(test_anno) == 2
    return ref_anno, test_anno


def align(ref_database, test_database, input_dir):
    """Compute (transfer_scale, transfer_pose) (reference
    compute_align_poses.py:66-109)."""
    ref_anno, test_anno = load_annotations(input_dir)

    def tri(database, annotation):
        id0 = str(database.img_fns.index(annotation[0]['name']))
        id1 = str(database.img_fns.index(annotation[1]['name']))
        return triangulate_pair(np.asarray(annotation[0]['kps'], np.float64),
                                np.asarray(annotation[1]['kps'], np.float64),
                                database.get_pose(id0), database.get_pose(id1),
                                database.get_K(id0), database.get_K(id1))

    pts3d_ref = tri(ref_database, ref_anno)
    pts3d_test = tri(test_database, test_anno)

    pts_test = pts3d_test - np.mean(pts3d_test, 0)
    pts_ref = pts3d_ref - np.mean(pts3d_ref, 0)
    transfer_scale = np.mean(np.linalg.norm(pts_test, 2, 1) /
                             np.linalg.norm(pts_ref, 2, 1))
    pts_ref = pts_ref * transfer_scale
    U, _, Vt = np.linalg.svd(pts_ref.T @ pts_test)
    R = Vt.T @ U.T
    t = (np.mean(pts3d_test, 0)[:, None] -
         transfer_scale * (R @ np.mean(pts3d_ref, 0)[:, None]))
    transfer_pose = np.concatenate([R, t], 1)
    return 1.0 / transfer_scale, transfer_pose


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--object', type=str, default='tformer')
    parser.add_argument('--anno_dir', type=str, default=None)
    parser.add_argument('--save', action='store_true', default=False)
    args = parser.parse_args()
    input_dir = args.anno_dir or f'align-data/{args.object}-anno'
    ref_db = GenMOPCOLMAPDatabase(f'genmop/{args.object}-ref')
    test_db = GenMOPCOLMAPDatabase(f'genmop/{args.object}-test')
    scale, pose = align(ref_db, test_db, input_dir)
    print('transfer_scale', scale)
    print('transfer_pose\n', pose)
    if args.save:
        out = f'{GENMOP_ROOT}/{args.object}-test/align.pkl'
        with open(out, 'wb') as f:
            pickle.dump((scale, pose), f)
        print('saved to', out)


if __name__ == '__main__':
    main()
