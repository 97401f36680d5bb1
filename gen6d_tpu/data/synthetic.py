"""Procedural synthetic scenes: a textured cube rendered with a pinhole camera.

Serves as the in-image test/bench dataset (no LINEMOD/GenMOP data ships with
this environment): known GT poses, masks, point cloud, diameter. Rendering is
painter's-algorithm face rasterization with per-face homography-warped
checkerboard textures (cv2 on host; images are produced once and cached).
"""
import cv2
import numpy as np

# unit cube centered at origin, edge length 1
_CUBE_VERTS = np.array([
    [-0.5, -0.5, -0.5], [0.5, -0.5, -0.5], [0.5, 0.5, -0.5], [-0.5, 0.5, -0.5],
    [-0.5, -0.5, 0.5], [0.5, -0.5, 0.5], [0.5, 0.5, 0.5], [-0.5, 0.5, 0.5],
], np.float32)

# faces as vertex index quads (outward CCW), with distinct base colors
_CUBE_FACES = [
    ([0, 3, 2, 1], (200, 60, 60)),    # z- face
    ([4, 5, 6, 7], (60, 200, 60)),    # z+
    ([0, 1, 5, 4], (60, 60, 200)),    # y-
    ([2, 3, 7, 6], (200, 200, 60)),   # y+
    ([0, 4, 7, 3], (200, 60, 200)),   # x-
    ([1, 2, 6, 5], (60, 200, 200)),   # x+
]


def _face_texture(base_color, size=64, checks=8, seed=0):
    rng = np.random.RandomState(seed)
    tex = np.zeros([size, size, 3], np.uint8)
    c = size // checks
    for i in range(checks):
        for j in range(checks):
            shade = 0.55 + 0.45 * ((i + j) % 2)
            jitter = rng.randint(-25, 25, 3)
            col = np.clip(np.array(base_color) * shade + jitter, 0, 255)
            tex[i * c:(i + 1) * c, j * c:(j + 1) * c] = col
    return tex


def look_at_pose(cam_pos, target=(0, 0, 0), up=(0, 0, 1)):
    """World->camera [3,4] pose looking from cam_pos to target (z forward)."""
    cam_pos = np.asarray(cam_pos, np.float64)
    z = np.asarray(target, np.float64) - cam_pos
    z /= np.linalg.norm(z)
    x = np.cross(z, np.asarray(up, np.float64))
    if np.linalg.norm(x) < 1e-6:
        x = np.cross(z, np.array([0.0, 1.0, 0.0]))
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z], 0)
    t = -R @ cam_pos
    return np.concatenate([R, t[:, None]], 1).astype(np.float32)


def sphere_poses(n, dist, hemisphere=True, seed=0, dist_jitter=0.0):
    """n camera poses on a (hemi)sphere via a Fibonacci lattice.

    ``dist_jitter`` > 0 scales each view's distance by a seeded uniform factor
    in [1, 1+dist_jitter] — distance (= object scale) diversity like a real
    handheld capture."""
    rng = np.random.RandomState(seed + 17)
    poses = []
    golden = (1 + 5 ** 0.5) / 2
    for i in range(n):
        zf = (i + 0.5) / n
        z = zf if hemisphere else 2 * zf - 1
        r = np.sqrt(max(1 - z * z, 0.0))
        th = 2 * np.pi * i / golden
        d = dist * (1.0 + rng.uniform(0.0, dist_jitter))
        cam = np.array([r * np.cos(th), r * np.sin(th), z * 0.8 + 0.2]) * d
        poses.append(look_at_pose(cam))
    return np.stack(poses, 0)


def render_cube(pose, K, hw, cube_scale=1.0, bg_color=(90, 90, 90), seed=0):
    """Render the textured cube. Returns (img uint8 (h,w,3), mask bool (h,w))."""
    h, w = hw
    img = np.full([h, w, 3], bg_color, np.uint8)
    mask = np.zeros([h, w], bool)
    verts = _CUBE_VERTS * cube_scale
    cam_pts = verts @ pose[:, :3].T + pose[:, 3]
    if np.any(cam_pts[:, 2] < 1e-3):
        return img, mask
    proj = cam_pts @ K.T
    pts2d = proj[:, :2] / proj[:, 2:]

    faces = []
    for idx, color in _CUBE_FACES:
        quad3d = cam_pts[idx]
        # back-face cull: outward normal must face the camera
        n = np.cross(quad3d[1] - quad3d[0], quad3d[3] - quad3d[0])
        if np.dot(n, quad3d.mean(0)) >= 0:
            continue
        faces.append((quad3d[:, 2].mean(), idx, color))
    faces.sort(key=lambda f: -f[0])  # far to near

    texs = {tuple(c): _face_texture(c, seed=seed) for _, c in _CUBE_FACES}
    for _, idx, color in faces:
        quad2d = pts2d[idx].astype(np.float32)
        tex = texs[tuple(color)]
        ts = tex.shape[0]
        src = np.array([[0, 0], [ts - 1, 0], [ts - 1, ts - 1], [0, ts - 1]], np.float32)
        H = cv2.getPerspectiveTransform(src, quad2d)
        warped = cv2.warpPerspective(tex, H, (w, h), flags=cv2.INTER_LINEAR)
        fmask = np.zeros([h, w], np.uint8)
        cv2.fillConvexPoly(fmask, np.round(quad2d).astype(np.int32), 1)
        img[fmask > 0] = warped[fmask > 0]
        mask |= fmask > 0
    return img, mask


def cube_point_cloud(n=2048, cube_scale=1.0, seed=0):
    """Points sampled on the cube surface (the GT 'object model' for metrics)."""
    rng = np.random.RandomState(seed)
    pts = rng.rand(n, 3).astype(np.float32) - 0.5
    ax = rng.randint(0, 3, n)
    sign = rng.randint(0, 2, n) * 2 - 1
    pts[np.arange(n), ax] = 0.5 * sign
    return pts * cube_scale


class SyntheticScene:
    """A full synthetic capture: n posed renderings of the textured cube."""

    def __init__(self, n_views=96, hw=(480, 640), dist=3.3, cube_scale=1.0,
                 f=520.0, seed=0, dist_jitter=0.5):
        # dist 3.3 x [1, 1.5]: the object projects to 2^[0.57, 1.17] x the
        # 128px reference crop — inside the detector's 2^[-0.5, 1.2] training
        # scale prior (reference train_dataset.py:438) with real diversity
        self.hw = hw
        self.cube_scale = cube_scale
        h, w = hw
        self.K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
        self.poses = sphere_poses(n_views, dist, seed=seed,
                                  dist_jitter=dist_jitter)
        self.seed = seed
        self._cache = {}
        self.point_cloud = cube_point_cloud(2048, cube_scale, seed)
        self.center = np.zeros(3, np.float32)
        self.vert = np.array([0, 0, 1], np.float32)
        self.diameter = float(np.sqrt(3.0) * cube_scale)

    def render(self, i):
        if i not in self._cache:
            self._cache[i] = render_cube(self.poses[i], self.K, self.hw,
                                         self.cube_scale, seed=self.seed)
        return self._cache[i]
