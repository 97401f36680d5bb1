"""Preparation workflows (port of reference prepare.py + colmap_script.py):
- video2image: split a capture video into frames;
- sfm: drive the external COLMAP executable to build a sparse model for a
  custom object (colmap stays an offline subprocess tool, SURVEY.md §2.9);
- gen_val_set: cache detector/selector predictions for refiner validation.
"""
import argparse
import os
import pickle
import subprocess
from pathlib import Path

import numpy as np

from gen6d_tpu.cli.predict import video2image
from gen6d_tpu.data import database as dbm
from gen6d_tpu.pipeline.loader import load_estimator


def run_sfm(image_dir, project_dir, colmap_path='colmap', same_camera=True,
            pseudo_intrinsics=True):
    """COLMAP feature_extractor -> exhaustive_matcher -> mapper ->
    image_undistorter + patch_match_stereo + stereo_fusion
    (reference colmap_script.py:13-106). ``pseudo_intrinsics`` pins the
    camera to the reference's pseudo-K convention (f = image diagonal,
    principal point at the center — colmap_script.py:71-87) instead of
    pre-seeding a SQLite database."""
    project_dir = Path(project_dir)
    project_dir.mkdir(exist_ok=True, parents=True)
    db_path = project_dir / 'database.db'
    sparse_dir = project_dir / 'sparse'
    sparse_dir.mkdir(exist_ok=True)
    extractor = [colmap_path, 'feature_extractor', '--database_path', str(db_path),
                 '--image_path', str(image_dir),
                 '--ImageReader.single_camera', '1' if same_camera else '0',
                 '--ImageReader.camera_model', 'SIMPLE_RADIAL']
    if pseudo_intrinsics:
        import glob as _glob
        from PIL import Image as _Image
        fns = sorted(_glob.glob(str(Path(image_dir) / '*.jpg')))
        if fns:
            w, h = _Image.open(fns[0]).size
            f = float(np.sqrt(h * h + w * w))
            extractor += ['--ImageReader.camera_params',
                          f'{f},{w / 2},{h / 2},0']
    cmds = [
        extractor,
        [colmap_path, 'exhaustive_matcher', '--database_path', str(db_path)],
        [colmap_path, 'mapper', '--database_path', str(db_path),
         '--image_path', str(image_dir), '--output_path', str(sparse_dir)],
    ]
    dense_dir = project_dir / 'dense'
    dense_cmds = [
        [colmap_path, 'image_undistorter', '--image_path', str(image_dir),
         '--input_path', str(sparse_dir / '0'), '--output_path', str(dense_dir)],
        [colmap_path, 'patch_match_stereo', '--workspace_path', str(dense_dir)],
        [colmap_path, 'stereo_fusion', '--workspace_path', str(dense_dir),
         '--output_path', str(project_dir / 'pointcloud.ply')],
    ]
    for cmd in cmds + dense_cmds:
        print(' '.join(cmd))
        subprocess.run(cmd, check=True)


def prepare_validation_set(ref_database_name, que_database_name, ref_split,
                           que_split, estimator_cfg, out_root='data/val',
                           estimator=None):
    """Cache det/sel predictions for the refiner val dataset
    (reference prepare.py:44-71). ``estimator`` overrides the config path
    (tests pass a small pre-built estimator)."""
    ref_database = dbm.parse_database_name(ref_database_name)
    que_database = dbm.parse_database_name(que_database_name)
    _, que_ids = dbm.get_database_split(que_database, que_split)

    if estimator is None:
        estimator = load_estimator(estimator_cfg)
    estimator.refiner = None  # detection+selection only
    estimator.build(ref_database, split_type=ref_split)

    det_info, sel_info = {}, {}
    for que_id in que_ids:
        img = que_database.get_image(que_id)
        K = que_database.get_K(que_id)
        _, inter = estimator.predict(img, K)
        det_info[que_id] = (inter['det_position'], inter['det_scale_r2q'], 0)
        ref_idx = inter['sel_ref_idx']
        sel_info[que_id] = (inter['sel_angle_r2q'],
                            np.asarray(estimator.ref_info['poses'][ref_idx]),
                            np.asarray(estimator.ref_info['Ks'][ref_idx]))

    os.makedirs(f'{out_root}/det/{que_database_name}', exist_ok=True)
    os.makedirs(f'{out_root}/sel/{que_database_name}', exist_ok=True)
    with open(f'{out_root}/det/{que_database_name}/det.pkl', 'wb') as f:
        pickle.dump(det_info, f)
    with open(f'{out_root}/sel/{que_database_name}/det-sel.pkl', 'wb') as f:
        pickle.dump(sel_info, f)
    return det_info, sel_info


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--action', type=str, required=True,
                        choices=['video2image', 'sfm', 'gen_val_set'])
    parser.add_argument('--input', type=str, default=None)
    parser.add_argument('--output', type=str, default=None)
    parser.add_argument('--frame_inter', type=int, default=30)
    parser.add_argument('--image_size', type=int, default=640)
    parser.add_argument('--transpose', action='store_true', default=False)
    parser.add_argument('--colmap', type=str, default='colmap')
    parser.add_argument('--database_name', type=str, default=None)
    parser.add_argument('--que_database', type=str, default=None)
    parser.add_argument('--ref_split', type=str, default='all')
    parser.add_argument('--que_split', type=str, default='all')
    parser.add_argument('--estimator_cfg', type=str,
                        default='configs/gen6d_synthetic.yaml')
    args = parser.parse_args()
    if args.action == 'video2image':
        video2image(args.input, args.output, args.frame_inter, args.image_size,
                    args.transpose)
    elif args.action == 'sfm':
        db_dir = Path(dbm.DATA_ROOT) / args.database_name
        run_sfm(db_dir / 'images', db_dir / 'colmap', args.colmap)
    elif args.action == 'gen_val_set':
        prepare_validation_set(args.database_name, args.que_database,
                               args.ref_split, args.que_split,
                               args.estimator_cfg)


if __name__ == '__main__':
    main()
