"""Visualization helpers (port of the essentials of reference
utils/draw_utils.py: bbox / 3D-bbox drawing, image grid concat)."""
import numpy as np

from gen6d_tpu.geometry.camera import project_points


def concat_images(img0, img1, vert=False):
    """Reference draw_utils.py concat_images."""
    if img0 is None:
        return img1
    if vert:
        h0, h1 = img0.shape[0], img1.shape[0]
        w0, w1 = img0.shape[1], img1.shape[1]
        if w0 < w1:
            img0 = np.pad(img0, ((0, 0), (0, w1 - w0), (0, 0)))
        if w1 < w0:
            img1 = np.pad(img1, ((0, 0), (0, w0 - w1), (0, 0)))
        return np.concatenate([img0, img1], 0)
    h0, h1 = img0.shape[0], img1.shape[0]
    if h0 < h1:
        img0 = np.pad(img0, ((0, h1 - h0), (0, 0), (0, 0)))
    if h1 < h0:
        img1 = np.pad(img1, ((0, h0 - h1), (0, 0), (0, 0)))
    return np.concatenate([img0, img1], 1)


def concat_images_list(*args, vert=False):
    """Reference draw_utils.py:162-169."""
    if len(args) == 1:
        return args[0]
    out = args[0]
    for img in args[1:]:
        out = concat_images(out, img, vert)
    return out


def _draw_line(img, p0, p1, color):
    """Integer Bresenham-ish line with thickness 1 (no cv2 dependency needed,
    but use cv2 when available for speed)."""
    try:
        import cv2
        cv2.line(img, tuple(np.round(p0).astype(int)),
                 tuple(np.round(p1).astype(int)), color, 2)
        return img
    except ImportError:
        n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]), 1))
        xs = np.linspace(p0[0], p1[0], n).round().astype(int)
        ys = np.linspace(p0[1], p1[1], n).round().astype(int)
        h, w = img.shape[:2]
        m = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
        img[ys[m], xs[m]] = color
        return img


def draw_bbox(img, bbox, color=(0, 255, 0)):
    """2D bbox [l,t,w,h] (reference draw_utils.py:223-230)."""
    img = np.ascontiguousarray(img.copy())
    l, t, w, h = bbox
    pts = [(l, t), (l + w, t), (l + w, t + h), (l, t + h)]
    for i in range(4):
        _draw_line(img, pts[i], pts[(i + 1) % 4], color)
    return img


def pts_range_to_bbox_pts(max_pt, min_pt):
    """8 corners of an axis-aligned box (reference draw_utils.py:258-268)."""
    pts = []
    for i in range(2):
        for j in range(2):
            for k in range(2):
                pt = [max_pt[0] if i else min_pt[0],
                      max_pt[1] if j else min_pt[1],
                      max_pt[2] if k else min_pt[2]]
                pts.append(pt)
    return np.asarray(pts, np.float32)


# 12 edges of the bbox corner ordering above
_BBOX_EDGES = [(0, 1), (0, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 7), (6, 7),
               (0, 4), (1, 5), (2, 6), (3, 7)]


def draw_bbox_3d(img, pts2d, color=(0, 0, 255)):
    """Project-drawn 3D bbox wireframe (reference draw_utils.py:274-287)."""
    img = np.ascontiguousarray(img.copy())
    for a, b in _BBOX_EDGES:
        _draw_line(img, pts2d[a], pts2d[b], color)
    return img


def draw_pose_bbox(img, pose, K, object_pts, color=(0, 0, 255)):
    """Draw the object's 3D bbox under a pose (the eval.py visualization)."""
    max_pt = object_pts.max(0)
    min_pt = object_pts.min(0)
    corners = pts_range_to_bbox_pts(max_pt, min_pt)
    pts2d, _ = project_points(corners, pose, K)
    return draw_bbox_3d(img, np.asarray(pts2d), color)
