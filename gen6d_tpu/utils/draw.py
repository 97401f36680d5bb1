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


def draw_keypoints(img, kps, colors=None, radius=3):
    """Draw keypoints as filled disks (reference draw_utils.py draw_keypoints)."""
    img = np.ascontiguousarray(img.copy())
    h, w = img.shape[:2]
    for i, (x, y) in enumerate(np.round(np.asarray(kps)).astype(int)):
        color = ((0, 255, 0) if colors is None
                 else tuple(int(c) for c in colors[i % len(colors)]))
        y0, y1 = max(0, y - radius), min(h, y + radius + 1)
        x0, x1 = max(0, x - radius), min(w, x + radius + 1)
        if y0 < y1 and x0 < x1:
            img[y0:y1, x0:x1] = color
    return img


def draw_correspondences(img0, img1, kps0, kps1, colors=None):
    """Side-by-side keypoint correspondence visualization
    (reference draw_utils.py draw_correspondence essentials)."""
    vis = concat_images(draw_keypoints(img0, kps0, colors),
                        draw_keypoints(img1, kps1, colors))
    off = img0.shape[1]
    for i, (p0, p1) in enumerate(zip(np.asarray(kps0), np.asarray(kps1))):
        color = ((0, 255, 0) if colors is None
                 else tuple(int(c) for c in colors[i % len(colors)]))
        _draw_line(vis, p0, (p1[0] + off, p1[1]), color)
    return vis


def draw_epipolar_line(img, F, point, color=(255, 0, 0)):
    """Draw the epipolar line of ``point`` under fundamental matrix F
    (reference draw_utils.py epipolar helpers)."""
    img = np.ascontiguousarray(img.copy())
    h, w = img.shape[:2]
    l = F @ np.array([point[0], point[1], 1.0])
    if abs(l[1]) > 1e-8:
        p0 = (0.0, -l[2] / l[1])
        p1 = (w - 1.0, -(l[2] + l[0] * (w - 1)) / l[1])
    else:
        p0 = (-l[2] / l[0], 0.0)
        p1 = (-l[2] / l[0], h - 1.0)
    return _draw_line(img, p0, p1, color)


def draw_pose_bbox(img, pose, K, object_pts, color=(0, 0, 255)):
    """Draw the object's 3D bbox under a pose (the eval.py visualization)."""
    max_pt = object_pts.max(0)
    min_pt = object_pts.min(0)
    corners = pts_range_to_bbox_pts(max_pt, min_pt)
    pts2d, _ = project_points(corners, pose, K)
    return draw_bbox_3d(img, np.asarray(pts2d), color)


def draw_histogram(values, bins=32, hw=(120, 240), color=(80, 160, 255),
                   bg=(255, 255, 255)):
    """Render a value histogram as an image (reference utils/draw_utils.py
    histogram helpers; debug visualization)."""
    values = np.asarray(values, np.float64).reshape(-1)
    h, w = hw
    img = np.full([h, w, 3], bg, np.uint8)
    if values.size == 0:
        return img
    counts, _ = np.histogram(values, bins=bins)
    peak = max(int(counts.max()), 1)
    bw = max(w // bins, 1)
    for i, c in enumerate(counts):
        bh = int(round((h - 2) * c / peak))
        if bh <= 0:
            continue
        x0 = i * bw
        img[h - 1 - bh:h - 1, x0:min(x0 + bw - 1, w)] = color
    return img
