"""Procedural synthetic scenes: textured convex solids rendered with a pinhole
camera.

The environment ships no LINEMOD/GenMOP/GSO/ShapeNet data, so this module is
both the test/bench dataset and the multi-object training pool standing in for
the reference's GSO/ShapeNet/CO3D databases (reference dataset/database.py:
412-665): known GT poses, masks, point cloud, diameter; N distinct objects =
(shape, texture, seed) combinations. Rendering is painter's-algorithm triangle
rasterization with per-face affine-warped procedural textures (cv2 on host;
images are rendered once and cached).
"""
import cv2
import numpy as np

# ----------------------------------------------------------------- solids
# Each maker returns (verts (v,3) float32 centered at origin, faces: list of
# vertex-index polygons). Outward orientation is normalized in make_solid.

_PHI = (1 + 5 ** 0.5) / 2


def _cube_mesh(aspect=(1.0, 1.0, 1.0)):
    s = np.asarray(aspect, np.float32) * 0.5
    v = np.array([[x, y, z] for z in (-1, 1) for y in (-1, 1) for x in (-1, 1)],
                 np.float32) * s
    faces = [[0, 1, 3, 2], [4, 6, 7, 5], [0, 4, 5, 1], [2, 3, 7, 6],
             [0, 2, 6, 4], [1, 5, 7, 3]]
    return v, faces


def _tet_mesh():
    v = np.array([[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]],
                 np.float32) * 0.45
    faces = [[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]]
    return v, faces


def _oct_mesh():
    v = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                  [0, 0, 1], [0, 0, -1]], np.float32) * 0.62
    faces = [[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
             [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]]
    return v, faces


def _prism_mesh(n_sides=6, height=0.8, radius=0.5):
    th = 2 * np.pi * np.arange(n_sides) / n_sides
    ring = np.stack([radius * np.cos(th), radius * np.sin(th)], 1)
    bot = np.concatenate([ring, np.full((n_sides, 1), -height / 2)], 1)
    top = np.concatenate([ring, np.full((n_sides, 1), height / 2)], 1)
    v = np.concatenate([bot, top], 0).astype(np.float32)
    faces = [list(range(n_sides))[::-1], [n_sides + i for i in range(n_sides)]]
    for i in range(n_sides):
        j = (i + 1) % n_sides
        faces.append([i, j, n_sides + j, n_sides + i])
    return v, faces


def _ico_mesh():
    v = []
    for a in (-1, 1):
        for b in (-_PHI, _PHI):
            v += [[0, a, b], [a, b, 0], [b, 0, a]]
    v = np.asarray(v, np.float32)
    v = v / np.linalg.norm(v[0]) * 0.58
    # faces from convex hull of the 12 vertices
    faces = _hull_faces(v)
    return v, faces


def _hull_faces(v):
    """Triangular faces of the convex hull via brute force (tiny vert counts)."""
    from itertools import combinations
    n = len(v)
    faces = []
    for tri in combinations(range(n), 3):
        a, b, c = (v[i] for i in tri)
        nrm = np.cross(b - a, c - a)
        if np.linalg.norm(nrm) < 1e-8:
            continue
        d = (v - a) @ nrm
        if np.all(d <= 1e-6) or np.all(d >= -1e-6):
            faces.append(list(tri))
    # dedup
    seen, out = set(), []
    for f in faces:
        k = tuple(sorted(f))
        if k not in seen:
            seen.add(k)
            out.append(f)
    return out


def _dodeca_mesh():
    """Dodecahedron (12 pentagonal faces) via the hull of its 20 vertices."""
    v = []
    for x in (-1, 1):
        for y in (-1, 1):
            for z in (-1, 1):
                v.append([x, y, z])
    for a in (-1 / _PHI, 1 / _PHI):
        for b in (-_PHI, _PHI):
            v += [[0, a, b], [a, b, 0], [b, 0, a]]
    v = np.asarray(v, np.float32)
    v = v / np.linalg.norm(v[0]) * 0.58
    return v, _hull_faces(v)


def _bipyr_mesh(n_sides=5, height=0.65, radius=0.5):
    """n-gonal bipyramid: an equatorial ring + two apexes."""
    th = 2 * np.pi * np.arange(n_sides) / n_sides
    ring = np.stack([radius * np.cos(th), radius * np.sin(th),
                     np.zeros(n_sides)], 1)
    v = np.concatenate([ring, [[0, 0, height], [0, 0, -height]]],
                       0).astype(np.float32)
    faces = []
    for i in range(n_sides):
        j = (i + 1) % n_sides
        faces += [[i, j, n_sides], [j, i, n_sides + 1]]
    return v, faces


SHAPES = ('cube', 'cuboid', 'tet', 'oct', 'prism', 'ico', 'slab',
          'dodeca', 'wedge', 'bipyr')


def make_solid(shape):
    """-> (verts, faces) with faces oriented outward (CCW from outside)."""
    if shape == 'cube':
        v, faces = _cube_mesh()
    elif shape == 'cuboid':
        v, faces = _cube_mesh((1.3, 0.85, 0.55))
    elif shape == 'slab':
        v, faces = _cube_mesh((1.4, 1.1, 0.3))
    elif shape == 'tet':
        v, faces = _tet_mesh()
    elif shape == 'oct':
        v, faces = _oct_mesh()
    elif shape == 'prism':
        v, faces = _prism_mesh()
    elif shape == 'wedge':
        v, faces = _prism_mesh(n_sides=3, height=0.9, radius=0.55)
    elif shape == 'ico':
        v, faces = _ico_mesh()
    elif shape == 'dodeca':
        v, faces = _dodeca_mesh()
    elif shape == 'bipyr':
        v, faces = _bipyr_mesh()
    else:
        raise ValueError(shape)
    # normalize outward orientation: the solid is star-shaped around origin
    out = []
    for f in faces:
        a, b, c = v[f[0]], v[f[1]], v[f[2]]
        nrm = np.cross(b - a, c - a)
        cen = v[f].mean(0)
        out.append(f if np.dot(nrm, cen) > 0 else f[::-1])
    return v, out


# ---------------------------------------------------------------- textures
TEXTURES = ('checks', 'stripes', 'noise', 'blobs', 'rings', 'grid')


def face_texture(base_color, texture='checks', size=64, seed=0):
    rng = np.random.RandomState(seed)
    base = np.asarray(base_color, np.float32)
    if texture == 'checks':
        checks = int(rng.choice([4, 6, 8]))
        tex = np.zeros([size, size, 3], np.float32)
        c = size // checks
        for i in range(checks):
            for j in range(checks):
                shade = 0.55 + 0.45 * ((i + j) % 2)
                jitter = rng.randint(-25, 25, 3)
                tex[i * c:(i + 1) * c, j * c:(j + 1) * c] = base * shade + jitter
    elif texture == 'stripes':
        period = int(rng.choice([6, 8, 12]))
        ang = rng.uniform(0, np.pi)
        yy, xx = np.mgrid[0:size, 0:size]
        ph = xx * np.cos(ang) + yy * np.sin(ang)
        stripe = ((ph // period) % 2).astype(np.float32)
        other = np.clip(base * rng.uniform(0.3, 0.7) +
                        rng.randint(-40, 40, 3), 0, 255)
        tex = stripe[..., None] * base + (1 - stripe[..., None]) * other
    elif texture == 'noise':
        small = rng.randint(0, 255, (8, 8, 3)).astype(np.float32)
        tex = cv2.resize(small, (size, size), interpolation=cv2.INTER_LINEAR)
        tex = 0.55 * tex + 0.45 * base
    elif texture == 'blobs':
        tex = np.tile(base, (size, size, 1)).astype(np.float32)
        for _ in range(rng.randint(6, 12)):
            c = rng.randint(0, size, 2)
            r = rng.randint(4, 14)
            col = np.clip(base + rng.randint(-90, 90, 3), 0, 255)
            cv2.circle(tex, (int(c[0]), int(c[1])), int(r),
                       tuple(float(x) for x in col), -1)
    elif texture == 'rings':
        tex = np.tile(base, (size, size, 1)).astype(np.float32)
        c = rng.randint(size // 4, 3 * size // 4, 2)
        period = int(rng.choice([5, 7, 10]))
        other = np.clip(base * rng.uniform(0.3, 0.7) +
                        rng.randint(-50, 50, 3), 0, 255)
        yy, xx = np.mgrid[0:size, 0:size]
        rr = np.sqrt((xx - c[0]) ** 2 + (yy - c[1]) ** 2)
        ring = ((rr // period) % 2).astype(np.float32)[..., None]
        tex = ring * base + (1 - ring) * other
    elif texture == 'grid':
        shade = rng.uniform(0.75, 1.1)
        tex = np.tile(np.clip(base * shade, 0, 255),
                      (size, size, 1)).astype(np.float32)
        cell = int(rng.choice([8, 12, 16]))
        line = np.clip(base + rng.choice([-1, 1]) * rng.randint(60, 120, 3),
                       0, 255)
        w = max(1, cell // 6)
        for k in range(0, size, cell):
            tex[k:k + w, :] = line
            tex[:, k:k + w] = line
    else:
        raise ValueError(texture)
    return np.clip(tex, 0, 255).astype(np.uint8)


# --------------------------------------------------------------- rendering
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


class SolidMesh:
    """A textured convex solid: geometry + per-face textures + uv mapping."""

    def __init__(self, shape='cube', texture='checks', scale=1.0, seed=0):
        rng = np.random.RandomState(seed)
        verts, faces = make_solid(shape)
        self.verts = verts * scale
        self.faces = faces
        self.diameter = float(
            np.max(np.linalg.norm(self.verts[:, None] - self.verts[None], axis=-1)))
        # distinct per-face base colors (seeded hue wheel)
        hues = (np.linspace(0, 179, len(faces), endpoint=False) +
                rng.randint(0, 179)) % 180
        self.textures = []
        self.uvs = []
        ts = 64
        for fi, f in enumerate(faces):
            hsv = np.uint8([[[hues[fi], rng.randint(140, 255),
                              rng.randint(150, 255)]]])
            base = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)[0, 0].astype(np.float32)
            self.textures.append(face_texture(base, texture, ts,
                                              seed=seed * 131 + fi))
            # planar uv: project face verts onto its plane basis -> [0,ts-1]^2
            p = self.verts[f]
            n = np.cross(p[1] - p[0], p[2] - p[0])
            u = p[1] - p[0]
            u = u / (np.linalg.norm(u) + 1e-9)
            w = np.cross(n / (np.linalg.norm(n) + 1e-9), u)
            uv = np.stack([(p - p[0]) @ u, (p - p[0]) @ w], 1)
            uv -= uv.min(0)
            uv = uv / (uv.max() + 1e-9) * (ts - 1)
            self.uvs.append(uv.astype(np.float32))

    def render(self, pose, K, hw, bg_color=(90, 90, 90)):
        """-> (img uint8 (h,w,3), mask bool (h,w))."""
        h, w = hw
        img = np.full([h, w, 3], bg_color, np.uint8)
        mask = np.zeros([h, w], bool)
        cam_pts = self.verts @ pose[:, :3].T + pose[:, 3]
        if np.any(cam_pts[:, 2] < 1e-3):
            return img, mask
        proj = cam_pts @ K.T
        pts2d = (proj[:, :2] / proj[:, 2:]).astype(np.float32)

        order = []
        for fi, f in enumerate(self.faces):
            q = cam_pts[f]
            nrm = np.cross(q[1] - q[0], q[2] - q[0])
            if np.dot(nrm, q.mean(0)) >= 0:  # back-face
                continue
            order.append((q[:, 2].mean(), fi))
        order.sort(key=lambda x: -x[0])  # far to near

        for _, fi in order:
            f = self.faces[fi]
            tex = self.textures[fi]
            uv = self.uvs[fi]
            # fan triangulation with affine texture warp per triangle
            for t in range(1, len(f) - 1):
                tri_idx = [f[0], f[t], f[t + 1]]
                dst = pts2d[tri_idx]
                src = uv[[0, t, t + 1]]
                if abs(cv2.contourArea(dst)) < 0.5:
                    continue
                M = cv2.getAffineTransform(src, dst)
                warped = cv2.warpAffine(tex, M, (w, h),
                                        flags=cv2.INTER_LINEAR)
                fmask = np.zeros([h, w], np.uint8)
                cv2.fillConvexPoly(fmask, np.round(dst).astype(np.int32), 1)
                img[fmask > 0] = warped[fmask > 0]
                mask |= fmask > 0
        return img, mask

    def point_cloud(self, n=2048, seed=0):
        """Points sampled on the surface (the GT 'object model' for metrics)."""
        rng = np.random.RandomState(seed)
        tris = []
        for f in self.faces:
            for t in range(1, len(f) - 1):
                tris.append([f[0], f[t], f[t + 1]])
        tris = np.asarray(tris)
        a, b, c = (self.verts[tris[:, i]] for i in range(3))
        areas = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1)
        pick = rng.choice(len(tris), n, p=areas / areas.sum())
        r1 = np.sqrt(rng.rand(n, 1)).astype(np.float32)
        r2 = rng.rand(n, 1).astype(np.float32)
        pts = (1 - r1) * a[pick] + r1 * (1 - r2) * b[pick] + r1 * r2 * c[pick]
        return pts.astype(np.float32)


class SyntheticScene:
    """A full synthetic capture: n posed renderings of a textured solid."""

    def __init__(self, n_views=96, hw=(480, 640), dist=3.3, cube_scale=1.0,
                 f=520.0, seed=0, dist_jitter=0.5, shape='cube',
                 texture='checks'):
        # dist 3.3 x [1, 1.5]: the (cube) object projects to 2^[0.57, 1.17] x
        # the 128px reference crop — inside the detector's 2^[-0.5, 1.2]
        # training scale prior (reference train_dataset.py:438)
        self.hw = hw
        self.cube_scale = cube_scale
        h, w = hw
        self.K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
        self.poses = sphere_poses(n_views, dist, seed=seed,
                                  dist_jitter=dist_jitter)
        self.seed = seed
        self.mesh = SolidMesh(shape, texture, cube_scale, seed)
        self._cache = {}
        # committed render cache: deterministic renders keyed by all scene
        # params. READ by default when present (cuts ~20s of painter's-algo
        # rendering out of bench build, docs/profile.md §3); WRITTEN only with
        # GEN6D_SYNTH_CACHE_WRITE=1 (scripts/cache_bench_renders.py) so the
        # training pool's many ad-hoc scenes don't bloat the tree.
        import os
        key = (f'{shape}-{texture}-s{seed}-n{n_views}-{h}x{w}-f{f:g}-'
               f'd{dist:g}-j{dist_jitter:g}-c{cube_scale:g}')
        root = os.environ.get('GEN6D_SYNTH_CACHE')
        if root is None:
            root = os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), 'assets',
                'synth_cache')
        self._disk_dir = os.path.join(root, key)
        self._disk_write = bool(os.environ.get('GEN6D_SYNTH_CACHE_WRITE'))
        if self._disk_write:
            os.makedirs(self._disk_dir, exist_ok=True)
        self.point_cloud = self.mesh.point_cloud(2048, seed)
        self.center = np.zeros(3, np.float32)
        self.vert = np.array([0, 0, 1], np.float32)
        self.diameter = self.mesh.diameter

    def render(self, i):
        if i not in self._cache:
            import os
            path = os.path.join(self._disk_dir, f'{i}.png')
            mpath = os.path.join(self._disk_dir, f'{i}_m.png')
            if os.path.exists(path) and os.path.exists(mpath):
                from PIL import Image
                img = np.asarray(Image.open(path))
                mask = np.asarray(Image.open(mpath)) > 0
                self._cache[i] = (img, mask)
            else:
                self._cache[i] = self.mesh.render(self.poses[i], self.K,
                                                  self.hw)
                if self._disk_write:
                    from PIL import Image
                    img, mask = self._cache[i]
                    Image.fromarray(img).save(path, optimize=True)
                    Image.fromarray(mask.astype(np.uint8) * 255).save(
                        mpath, optimize=True)
        return self._cache[i]


# ------------------------------------------------------ back-compat helpers
def render_cube(pose, K, hw, cube_scale=1.0, bg_color=(90, 90, 90), seed=0):
    """Render a textured cube (kept for tests; see SolidMesh.render)."""
    return SolidMesh('cube', 'checks', cube_scale, seed).render(
        pose, K, hw, bg_color)


def cube_point_cloud(n=2048, cube_scale=1.0, seed=0):
    """Points sampled on the cube surface (kept for tests)."""
    return SolidMesh('cube', 'checks', cube_scale, seed).point_cloud(n, seed)
