"""Custom-object video inference with temporal tracking + smoothing (port of
reference predict.py:18-96): per-frame predict with pose_init tracking
(refine_iter forced to 1), exp-decay weighted moving average of projected bbox
corners, PnP re-solve, ffmpeg render."""
import argparse
import subprocess
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from gen6d_tpu.data import database as dbm
from gen6d_tpu.geometry.solvers import pnp_gauss_newton
from gen6d_tpu.pipeline.loader import load_estimator
from gen6d_tpu.utils.draw import draw_bbox_3d, pts_range_to_bbox_pts
from gen6d_tpu.geometry.camera import project_points


def weighted_pts(pts_list, weight_num=10, std_inv=10):
    """Reference predict.py:18-26."""
    weights = np.exp(-(np.arange(weight_num) / std_inv) ** 2)[::-1]
    pose_num = len(pts_list)
    if pose_num < weight_num:
        weights = weights[-pose_num:]
    else:
        pts_list = pts_list[-weight_num:]
    return np.sum(np.asarray(pts_list) * weights[:, None, None], 0) / np.sum(weights)


def video2image(input_video, output_dir, interval=30, image_size=640,
                transpose=False):
    """Reference prepare.py:16-42."""
    import cv2
    from PIL import Image
    Path(output_dir).mkdir(parents=True, exist_ok=True)
    vidcap = cv2.VideoCapture(input_video)
    success, image = vidcap.read()
    count = 0
    saved = 0
    while success:
        if count % interval == 0:
            h, w = image.shape[:2]
            ratio = image_size / max(h, w)
            image_r = cv2.resize(image, (int(ratio * w), int(ratio * h)),
                                 interpolation=cv2.INTER_LINEAR)
            if transpose:
                image_r = cv2.flip(cv2.flip(image_r, 0), 1)
            rgb = cv2.cvtColor(image_r, cv2.COLOR_BGR2RGB)
            Image.fromarray(rgb).save(f'{output_dir}/frame{saved}.jpg')
            saved += 1
        success, image = vidcap.read()
        count += 1
    return saved


def track_video(cfg_path, database_name, video, output, interval=1,
                resolution=960, transpose=False, smooth_num=5, smooth_std=2.5,
                ffmpeg='ffmpeg'):
    from PIL import Image
    cfg = None
    estimator = load_estimator(cfg_path)
    ref_database = dbm.parse_database_name(database_name)
    estimator.build(ref_database, split_type='all')

    object_pts = dbm.get_ref_point_cloud(ref_database)
    object_bbox_3d = pts_range_to_bbox_pts(np.max(object_pts, 0),
                                           np.min(object_pts, 0))

    output_dir = Path(output)
    for sub in ('images_raw', 'images_out', 'images_out_smooth'):
        (output_dir / sub).mkdir(exist_ok=True, parents=True)
    que_num = video2image(video, output_dir / 'images_raw', interval,
                          resolution, transpose)

    pose_init = None
    hist_pts = []
    for que_id in range(que_num):
        img = np.asarray(Image.open(output_dir / 'images_raw' / f'frame{que_id}.jpg'))
        h, w, _ = img.shape
        f = np.sqrt(h ** 2 + w ** 2)  # pseudo-K (predict.py:52-54)
        K = np.asarray([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)

        if pose_init is not None:
            estimator.cfg['refine_iter'] = 1  # tracking mode (predict.py:57)
        pose_pr, _ = estimator.predict(img, K, pose_init=pose_init)
        pose_init = pose_pr

        pts, _ = project_points(jnp.asarray(object_bbox_3d),
                                jnp.asarray(pose_pr), jnp.asarray(K))
        pts = np.asarray(pts)
        Image.fromarray(draw_bbox_3d(img, pts, (0, 0, 255))).save(
            output_dir / 'images_out' / f'{que_id}-bbox.jpg')
        np.save(str(output_dir / 'images_out' / f'{que_id}-pose.npy'), pose_pr)

        hist_pts.append(pts)
        pts_s = weighted_pts(hist_pts, weight_num=smooth_num, std_inv=smooth_std)
        pose_s = np.asarray(pnp_gauss_newton(jnp.asarray(object_bbox_3d),
                                             jnp.asarray(pts_s, jnp.float32),
                                             jnp.asarray(K),
                                             jnp.asarray(pose_pr)))
        pts_s2, _ = project_points(jnp.asarray(object_bbox_3d),
                                   jnp.asarray(pose_s), jnp.asarray(K))
        Image.fromarray(draw_bbox_3d(img, np.asarray(pts_s2), (0, 0, 255))).save(
            output_dir / 'images_out_smooth' / f'{que_id}-bbox.jpg')

    cmd = [ffmpeg, '-y', '-framerate', '30', '-r', '30',
           '-i', f'{output_dir}/images_out_smooth/%d-bbox.jpg',
           '-c:v', 'libx264', '-pix_fmt', 'yuv420p', f'{output_dir}/video.mp4']
    try:
        subprocess.run(cmd, check=False)
    except FileNotFoundError:
        print('ffmpeg not found; skipping video render')
    return que_num


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--cfg', type=str, default='configs/gen6d_synthetic.yaml')
    parser.add_argument('--database', type=str, default='custom/mouse')
    parser.add_argument('--output', type=str, default='data/custom/mouse/test')
    parser.add_argument('--video', type=str, required=True)
    parser.add_argument('--resolution', type=int, default=960)
    parser.add_argument('--transpose', action='store_true', default=False)
    parser.add_argument('--num', type=int, default=5)
    parser.add_argument('--std', type=float, default=2.5)
    parser.add_argument('--ffmpeg', type=str, default='ffmpeg')
    args = parser.parse_args()
    track_video(args.cfg, args.database, args.video, args.output,
                resolution=args.resolution, transpose=args.transpose,
                smooth_num=args.num, smooth_std=args.std, ffmpeg=args.ffmpeg)


if __name__ == '__main__':
    main()
