"""Posed-reference-image databases.

Port of the reference data layer (dataset/database.py:30-410,667-695) with the
same public surface: ``BaseDatabase`` accessors, ``parse_database_name``,
``get_database_split``, object meta helpers and ``NormalizedDatabase``. Adds a
``SyntheticDatabase`` (procedural textured cube) used by tests and benchmarks —
this environment ships no LINEMOD/GenMOP data.

All host-side numpy; images are uint8 HWC RGB.
"""
import abc
import glob
import os
import pickle
from pathlib import Path

import numpy as np
from PIL import Image as PILImage

from gen6d_tpu.data.colmap import read_model
from gen6d_tpu.data.ply import load_ply_vertices
from gen6d_tpu.data.synthetic import SyntheticScene

DATA_ROOT = os.environ.get('GEN6D_DATA_ROOT', 'data')
LINEMOD_ROOT = f'{DATA_ROOT}/LINEMOD'
GENMOP_ROOT = f'{DATA_ROOT}/GenMOP'


def imread(path):
    """Image decode via the native host runtime (native/gen6d_native.cpp,
    libjpeg/libpng), PIL fallback."""
    from gen6d_tpu.utils import native
    if native.available():
        p = str(path)
        if p.lower().endswith(('.jpg', '.jpeg')):
            img = native.decode_jpeg(p)
            if img is not None:
                return img
        elif p.lower().endswith('.png'):
            img = native.decode_png(p)
            if img is not None:
                if img.shape[2] == 4:
                    img = img[..., :3]
                elif img.shape[2] == 1:
                    img = np.repeat(img, 3, axis=2)
                return img
    return np.asarray(PILImage.open(path).convert('RGB'))


def read_pickle(path):
    with open(path, 'rb') as f:
        return pickle.load(f)


def save_pickle(data, path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, 'wb') as f:
        pickle.dump(data, f)


def pose_compose_np(pose0, pose1):
    R = pose1[:, :3] @ pose0[:, :3]
    t = pose1[:, :3] @ pose0[:, 3:] + pose1[:, 3:]
    return np.concatenate([R, t], 1)


class BaseDatabase(abc.ABC):
    """Reference dataset/database.py:30-54."""

    def __init__(self, database_name):
        self.database_name = database_name

    @abc.abstractmethod
    def get_image(self, img_id):
        ...

    @abc.abstractmethod
    def get_K(self, img_id):
        ...

    @abc.abstractmethod
    def get_pose(self, img_id):
        ...

    @abc.abstractmethod
    def get_img_ids(self):
        ...

    def get_mask(self, img_id):
        img = self.get_image(img_id)
        return np.ones(img.shape[:2], bool)

    def get_image_path(self, img_id):
        """Path of the image file, or None for procedurally generated data —
        lets batch loaders use the native threaded decoder."""
        return None


class LINEMODDatabase(BaseDatabase):
    """Reference dataset/database.py:56-105: fixed K, poses from .npy files,
    ply model subsampled to 4096 points."""
    K = np.array([[572.4114, 0., 325.2611],
                  [0., 573.57043, 242.04899],
                  [0., 0., 1.]], dtype=np.float32)

    def __init__(self, database_name):
        super().__init__(database_name)
        _, self.model_name = database_name.split('/')
        self.root = f'{LINEMOD_ROOT}/{self.model_name}'
        self.img_ids = [str(k) for k in
                        range(len(os.listdir(f'{self.root}/JPEGImages')))]
        self.model = self._load_model().astype(np.float32)
        self.object_center = np.zeros(3, dtype=np.float32)
        self.object_vert = np.asarray([0, 0, 1], np.float32)
        self._pose_cache = {}

    def _load_model(self):
        cache = Path(f'{self.root}/{self.model_name}.pkl')
        if cache.exists():
            return read_pickle(str(cache))
        model = load_ply_vertices(f'{self.root}/{self.model_name}.ply')
        if model.shape[0] > 4096:
            idxs = np.arange(model.shape[0])
            np.random.shuffle(idxs)
            model = model[idxs[:4096]]
        save_pickle(model, str(cache))
        return model

    def get_image(self, img_id):
        return imread(self.get_image_path(img_id))

    def get_image_path(self, img_id):
        return f'{self.root}/JPEGImages/{int(img_id):06}.jpg'

    def get_K(self, img_id):
        return np.copy(self.K)

    def get_pose(self, img_id):
        if img_id not in self._pose_cache:
            self._pose_cache[img_id] = np.load(f'{self.root}/pose/pose{int(img_id)}.npy')
        return self._pose_cache[img_id]

    def get_img_ids(self):
        return self.img_ids.copy()

    def get_mask(self, img_id):
        return np.asarray(PILImage.open(
            f'{self.root}/mask/{int(img_id):04}.png')).sum(-1) > 0


# per-object gravity/forward vectors (reference dataset/database.py:109-120)
GENMOP_META_INFO = {
    'cup': {'gravity': (-0.0893124, -0.399691, -0.912288),
            'forward': (-0.009871, 0.693020, -0.308549)},
    'tformer': {'gravity': (-0.0734401, -0.633415, -0.77032),
                'forward': (-0.121561, -0.249061, 0.211048)},
    'chair': {'gravity': (0.111445, -0.373825, -0.920779),
              'forward': (0.788313, -0.139603, 0.156288)},
    'knife': {'gravity': (-0.0768299, -0.257446, -0.963234),
              'forward': (0.954157, 0.401808, -0.285027)},
    'love': {'gravity': (0.131457, -0.328559, -0.93529),
             'forward': (-0.045739, -1.437427, 0.497225)},
    'plug_cn': {'gravity': (-0.0267497, -0.406514, -0.913253),
                'forward': (-0.172773, -0.441210, 0.216283)},
    'plug_en': {'gravity': (0.0668682, -0.296538, -0.952677),
                'forward': (0.229183, -0.923874, 0.296636)},
    'miffy': {'gravity': (-0.153506, -0.35346, -0.922769),
              'forward': (-0.584448, -1.111544, 0.490026)},
    'scissors': {'gravity': (-0.129767, -0.433414, -0.891803),
                 'forward': (1.899760, 0.418542, -0.473156)},
    'piggy': {'gravity': (-0.122392, -0.344009, -0.930955),
              'forward': (0.079012, 1.441836, -0.524981)},
}


def compute_gravity_rotation(vert, forward):
    """Rotation aligning (forward, vert) to canonical axes
    (reference database.py:159-167)."""
    vert = np.asarray(vert, np.float64)
    forward = np.asarray(forward, np.float64)
    y = np.cross(vert, forward)
    x = np.cross(y, vert)
    vert = vert / np.linalg.norm(vert)
    x = x / np.linalg.norm(x)
    y = y / np.linalg.norm(y)
    return np.stack([x, y, vert], 0)


class GenMOPMetaInfo:
    """Reference database.py:121-167: rotate the SfM frame so gravity is -z and
    scale the object bbox diagonal to 2."""

    def __init__(self, object_name):
        self.object_name = object_name
        if object_name in GENMOP_META_INFO:
            meta = GENMOP_META_INFO[object_name]
        else:
            # objects beyond the 10 shipped ones (e.g. synthetic GenMOP-format
            # test data) read gravity/forward from <obj>-ref/meta_info.txt,
            # the same 2-row format CustomDatabase uses
            d = np.loadtxt(f'{GENMOP_ROOT}/{object_name}-ref/meta_info.txt')
            meta = {'gravity': d[0], 'forward': d[1]}
        self.gravity = np.asarray(meta['gravity'], np.float32)
        self.forward = np.asarray(meta['forward'], np.float32)
        self.object_point_cloud = load_ply_vertices(
            f'{GENMOP_ROOT}/{object_name}-ref/object_point_cloud.ply')
        self.rotation = compute_gravity_rotation(self.gravity, self.forward)
        self.object_point_cloud = self.object_point_cloud @ self.rotation.T
        min_pt = np.min(self.object_point_cloud, 0)
        max_pt = np.max(self.object_point_cloud, 0)
        self.scale_ratio = 2.0 / np.linalg.norm(max_pt - min_pt)
        self.object_point_cloud = self.object_point_cloud * self.scale_ratio
        min_pt = np.min(self.object_point_cloud, 0)
        max_pt = np.max(self.object_point_cloud, 0)
        self.center = ((max_pt + min_pt) / 2).astype(np.float32)

    def normalize_pose(self, pose):
        R = pose[:3, :3] @ self.rotation.T
        t = self.scale_ratio * pose[:3, 3:]
        return np.concatenate([R, t], 1).astype(np.float32)


def parse_colmap_project(cameras, images, img_fns):
    """COLMAP model -> (poses, Ks, img_ids) keyed by frame index
    (reference database.py:170-192)."""
    first = images[next(iter(images))]
    windows_names = first.name.startswith('frame')
    if windows_names:
        name2id = {v.name: k for k, v in images.items()}
    else:
        name2id = {v.name[:-4]: k for k, v in images.items()}
    poses, Ks = {}, {}
    img_ids = [str(k) for k in range(len(img_fns))]
    for img_id in img_ids:
        key = img_fns[int(img_id)] if windows_names else img_id
        if key not in name2id:
            continue
        db_id = name2id[key]
        poses[img_id] = images[db_id].pose()
        cam = cameras[images[db_id].camera_id]
        Ks[img_id] = cam.K()
    return poses, Ks, img_ids


class GenMOPDatabase(BaseDatabase):
    """Reference database.py:194-237: COLMAP-posed video sequences; test
    sequences aligned to the ref sequence via align.pkl."""

    def __init__(self, database_name):
        super().__init__(database_name)
        _, seq_name = database_name.split('/')  # <object>-ref or <object>-test
        self.seq_name = seq_name
        self.root = Path(GENMOP_ROOT) / seq_name
        self.img_fns = read_pickle(str(self.root / 'images_fn_cache.pkl'))
        cameras, images, _ = read_model(
            f'{GENMOP_ROOT}/{seq_name}/colmap-all/colmap_default-colmap_default/sparse/0')
        self.poses, self.Ks, self.img_ids = parse_colmap_project(
            cameras, images, self.img_fns)

        object_name, database_type = seq_name.split('-')
        if database_type == 'test':
            scale_ratio, transfer_pose = read_pickle(
                f'{GENMOP_ROOT}/{seq_name}/align.pkl')
            for img_id in self.get_img_ids():
                pose_new = pose_compose_np(transfer_pose, self.poses[img_id])
                pose_new[:, 3:] *= scale_ratio
                self.poses[img_id] = pose_new

        self.meta_info = GenMOPMetaInfo(object_name)
        self.poses = {i: self.meta_info.normalize_pose(self.poses[i])
                      for i in self.get_img_ids()}

    def get_image(self, img_id):
        return imread(self.get_image_path(img_id))

    def get_image_path(self, img_id):
        return str(self.root / 'images' / self.img_fns[int(img_id)])

    def get_K(self, img_id):
        return self.Ks[img_id].copy()

    def get_pose(self, img_id):
        return self.poses[img_id].copy()

    def get_img_ids(self):
        return self.img_ids


class CustomDatabase(BaseDatabase):
    """User-captured objects: COLMAP sparse model + meta_info.txt + cropped
    object point cloud (reference database.py:238-293)."""

    def __init__(self, database_name):
        super().__init__(database_name)
        self.root = Path(os.path.join(DATA_ROOT, database_name))
        self.img_dir = self.root / 'images'
        if (self.root / 'img_fns.pkl').exists():
            self.img_fns = read_pickle(str(self.root / 'img_fns.pkl'))
        else:
            self.img_fns = [Path(fn).name
                            for fn in glob.glob(str(self.img_dir) + '/*.jpg')]
            save_pickle(self.img_fns, str(self.root / 'img_fns.pkl'))

        sparse = self.root / 'colmap' / 'sparse' / '0'
        if sparse.exists():
            cameras, images, _ = read_model(str(sparse))
            self.poses, self.Ks, self.img_ids = parse_colmap_project(
                cameras, images, self.img_fns)
        else:
            self.img_ids = [str(k) for k in range(len(self.img_fns))]
            self.poses, self.Ks = {}, {}

        if len(self.poses) > 0:
            directions = np.loadtxt(str(self.root / 'meta_info.txt'))
            x = directions[0]
            z = directions[1]
            self.object_point_cloud = load_ply_vertices(
                f'{self.root}/object_point_cloud.ply')
            self.rotation = compute_gravity_rotation(z, x)
            self.object_point_cloud = self.object_point_cloud @ self.rotation.T
            min_pt = np.min(self.object_point_cloud, 0)
            max_pt = np.max(self.object_point_cloud, 0)
            self.scale_ratio = 2.0 / np.linalg.norm(max_pt - min_pt)
            self.object_point_cloud = self.object_point_cloud * self.scale_ratio
            min_pt = np.min(self.object_point_cloud, 0)
            max_pt = np.max(self.object_point_cloud, 0)
            self.center = ((max_pt + min_pt) / 2).astype(np.float32)
            for k, pose in self.poses.items():
                R = pose[:3, :3] @ self.rotation.T
                t = self.scale_ratio * pose[:3, 3:]
                self.poses[k] = np.concatenate([R, t], 1).astype(np.float32)

    def get_image(self, img_id):
        return imread(self.get_image_path(img_id))

    def get_image_path(self, img_id):
        return str(self.img_dir / self.img_fns[int(img_id)])

    def get_K(self, img_id):
        return self.Ks[img_id].copy()

    def get_pose(self, img_id):
        return self.poses[img_id].copy()

    def get_img_ids(self):
        return self.img_ids


def mask_depth_to_points(mask, depth, K):
    """Backproject masked depth pixels to camera-frame 3D points."""
    ys, xs = np.nonzero(mask)
    z = depth[ys, xs]
    valid = z > 0
    ys, xs, z = ys[valid], xs[valid], z[valid]
    pts = np.stack([xs * z, ys * z, z], 1) @ np.linalg.inv(K).T
    return pts.astype(np.float32)


GSO_ROOT = f'{DATA_ROOT}/google_scanned_objects'


class GoogleScannedObjectDatabase(BaseDatabase):
    """GSO renderings (reference database.py:412-549): 250 posed views per
    object with rgb/mask/depth pngs, per-view 4x4 intrinsics/pose txts.
    Name: ``gso/<model>/<black|white>_<resolution|raw>``.

    Object center/vert/diameter come from depth+mask backprojection and are
    cached as pickles like the reference; images are resized lazily in memory
    (the reference materializes jpg caches on disk)."""

    def __init__(self, database_name):
        super().__init__(database_name)
        _, model_name, background_resolution = database_name.split('/')
        background, resolution = background_resolution.split('_')
        assert background in ('black', 'white')
        self.background = background
        self.resolution = resolution
        self.model_name = model_name
        self.prefix = f'{GSO_ROOT}/{model_name}'
        self._img_cache = {}
        self._pose_cache = {}

        center_fn = f'{self.prefix}/object_center.pkl'
        if os.path.exists(center_fn):
            self.object_center = read_pickle(center_fn)
        else:
            pts = self._object_points()
            self.object_center = (pts.max(0) + pts.min(0)) / 2
            save_pickle(self.object_center, center_fn)

        vert_fn = f'{self.prefix}/object_vert.pkl'
        if os.path.exists(vert_fn):
            self.object_vert = read_pickle(vert_fn)
        else:
            cams = np.stack([
                -self.get_pose(i)[:3, :3].T @ self.get_pose(i)[:3, 3]
                for i in self.get_img_ids()], 0)
            self.object_vert = np.mean(cams - self.object_center[None], 0)
            save_pickle(self.object_vert, vert_fn)

        diam_fn = f'{self.prefix}/object_diameter.pkl'
        if os.path.exists(diam_fn):
            self.object_diameter = read_pickle(diam_fn)
        else:
            pts = self._object_points()
            self.object_diameter = float(np.linalg.norm(pts.max(0) - pts.min(0)))
            save_pickle(self.object_diameter, diam_fn)

    def _object_points(self):
        """Union of depth-backprojected surface points over all views
        (reference get_object_points, database.py:487-504)."""
        fn = f'{DATA_ROOT}/gso_cache/{self.model_name}-pts.pkl'
        if os.path.exists(fn):
            return read_pickle(fn)
        rng = np.random.RandomState(0)
        all_pts = []
        for img_id in self.get_img_ids():
            depth = np.asarray(PILImage.open(
                f'{self.prefix}/depth/{int(img_id):06}.png'),
                np.float32) / 1000.0
            mask = self._raw_mask(img_id)
            pts = mask_depth_to_points(mask, depth, self._raw_K(img_id))
            pose = self.get_pose(img_id)
            # camera -> world
            pts = (pts - pose[:3, 3]) @ pose[:3, :3]
            idx = rng.permutation(len(pts))[:1024]
            all_pts.append(pts[idx])
        pts = np.concatenate(all_pts, 0)
        save_pickle(pts, fn)
        return pts

    def _raw_mask(self, img_id):
        return np.asarray(PILImage.open(
            f'{self.prefix}/mask/{int(img_id):06}.png')) > 0

    def _raw_K(self, img_id):
        K = np.loadtxt(
            f'{self.prefix}/intrinsics/{int(img_id):06}.txt').reshape(4, 4)
        return K[:3, :3].astype(np.float32)

    def _ratio(self):
        return 1.0 if self.resolution == 'raw' else int(self.resolution) / 512.0

    def get_image(self, img_id):
        key = ('img', img_id)
        if key not in self._img_cache:
            img = imread(f'{self.prefix}/rgb/{int(img_id):06}.png')
            mask = self._raw_mask(img_id)
            if self.background == 'black':
                img = img * mask[..., None].astype(np.uint8)
            if self.resolution != 'raw':
                r = int(self.resolution)
                img = np.asarray(PILImage.fromarray(img).resize(
                    (r, r), PILImage.BILINEAR))
            self._img_cache[key] = img
        return self._img_cache[key].copy()

    def get_mask(self, img_id):
        mask = self._raw_mask(img_id)
        if self.resolution != 'raw':
            r = int(self.resolution)
            mask = np.asarray(PILImage.fromarray(
                mask.astype(np.uint8)).resize((r, r), PILImage.NEAREST)) > 0
        return mask

    def get_K(self, img_id):
        K = self._raw_K(img_id)
        r = self._ratio()
        return (np.diag([r, r, 1.0]) @ K).astype(np.float32)

    def get_pose(self, img_id):
        if img_id not in self._pose_cache:
            # on disk: camera-to-world 4x4; we store world-to-camera [3,4]
            p = np.loadtxt(
                f'{self.prefix}/pose/{int(img_id):06}.txt').reshape(4, 4)[:3]
            R = p[:3, :3].T
            t = R @ -p[:3, 3:]
            self._pose_cache[img_id] = np.concatenate([R, t], 1).astype(
                np.float32)
        return self._pose_cache[img_id].copy()

    def get_img_ids(self):
        return [str(i) for i in range(250)]


CO3D_ROOT = f'{DATA_ROOT}/co3d'


class Co3DResizeDatabase(BaseDatabase):
    """Preprocessed CO3D crops (reference database.py:563-596).
    Name: ``co3d_resize/<category>/<sequence>/<fg>_<bg>``; reads
    ``info.pkl`` = (Ks, poses, img_ids, ratios) + images/ + masks/ dirs."""

    def __init__(self, database_name):
        super().__init__(database_name)
        _, self.category, self.sequence, sizes = database_name.split('/')
        self.fg_size, self.bg_size = (int(v) for v in sizes.split('_'))
        root = Path(f'{CO3D_ROOT}_{self.fg_size}_{self.bg_size}'
                    f'/{self.category}/{self.sequence}')
        info = root / 'info.pkl'
        if not info.exists():
            raise FileNotFoundError(
                f'{info}: Co3DResize databases require the preprocessed '
                f'crops (reference database.py:570-577)')
        self.Ks, self.poses, self.img_ids, self.ratios = read_pickle(str(info))
        self.image_root = root / 'images'
        self.mask_root = root / 'masks'

    def get_image(self, img_id):
        return imread(self.get_image_path(img_id))

    def get_image_path(self, img_id):
        return str(self.image_root / f'{img_id}.jpg')

    def get_K(self, img_id):
        return self.Ks[img_id].copy()

    def get_pose(self, img_id):
        return self.poses[img_id].copy()

    def get_img_ids(self):
        return self.img_ids

    def get_mask(self, img_id):
        return np.asarray(PILImage.open(
            str(self.mask_root / f'{img_id}.png'))) > 0


SHAPENET_RENDER_ROOT = f'{DATA_ROOT}/shapenet/shapenet_render'


class ShapeNetRenderDatabase(BaseDatabase):
    """ShapeNet renderings (reference database.py:600-665).
    Name: ``shapenet/<category>/<model>/<render_setting>`` (e.g.
    ``evenly-32-128``); reads ``<i>.png`` (RGBA; alpha = mask) and
    ``<i>-camera.pkl`` = (pose, K), with cached camera/vert pickles."""

    def __init__(self, database_name):
        super().__init__(database_name)
        _, self.category, self.model_name, self.render_setting = \
            database_name.split('/')
        self.render_num = int(self.render_setting.split('-')[1])
        self.object_vert = np.asarray([0, 1, 0], np.float32)
        self.prefix = (f'{SHAPENET_RENDER_ROOT}/{self.render_setting}'
                       f'/{self.category}/{self.model_name}')

        self._cams = {}
        cache = Path(f'{DATA_ROOT}/shapenet/shapenet_cache/'
                     f'{self.category}-{self.model_name}-'
                     f'{self.render_setting}.pkl')
        if cache.exists():
            self._cams = read_pickle(str(cache))
        else:
            for i in self.get_img_ids():
                self._camera(i)
            cache.parent.mkdir(parents=True, exist_ok=True)
            save_pickle(self._cams, str(cache))

        verts_cache = Path(f'{DATA_ROOT}/shapenet/shapenet_cache/'
                           f'{self.category}-{self.model_name}-'
                           f'{self.render_setting}-verts.pkl')
        if verts_cache.exists():
            (self.model_verts, self.object_center,
             self.object_diameter) = read_pickle(str(verts_cache))
        else:
            # parsing ShapeNetCore meshes needs the raw dataset; the reference
            # also requires the cache to exist (database.py:633-638)
            raise FileNotFoundError(
                f'{verts_cache}: ShapeNetRender databases require the '
                f'cached model verts')

    def _camera(self, img_id):
        if img_id not in self._cams:
            self._cams[img_id] = read_pickle(
                f'{self.prefix}/{img_id}-camera.pkl')
        return self._cams[img_id]

    def get_image(self, img_id):
        return np.asarray(PILImage.open(
            f'{self.prefix}/{img_id}.png').convert('RGB'))

    def get_K(self, img_id):
        return np.copy(self._camera(img_id)[1])

    def get_pose(self, img_id):
        return np.copy(self._camera(img_id)[0])

    def get_img_ids(self):
        return [str(k) for k in range(self.render_num)]

    def get_mask(self, img_id):
        rgba = np.asarray(PILImage.open(f'{self.prefix}/{img_id}.png'))
        if rgba.ndim == 3 and rgba.shape[2] == 4:
            return rgba[..., 3] > 0
        return rgba.sum(-1) > 0


class SyntheticDatabase(BaseDatabase):
    """Procedural textured-solid captures (tests/benchmarks/training pool).
    Name format: ``synthetic/<n_views>[@<seed>][:<shape>[-<texture>]]``,
    e.g. ``synthetic/64``, ``synthetic/96@3:ico-stripes``. Shapes/textures:
    gen6d_tpu.data.synthetic.SHAPES / TEXTURES."""

    def __init__(self, database_name):
        super().__init__(database_name)
        spec = database_name.split('/')[1]
        shape, texture, seed = 'cube', 'checks', 0
        if ':' in spec:
            spec, obj = spec.split(':')
            if '-' in obj:
                shape, texture = obj.split('-')
            else:
                shape = obj
        if '@' in spec:
            spec, seed = spec.split('@')
            seed = int(seed)
        self.scene = SyntheticScene(n_views=int(spec), seed=seed, shape=shape,
                                    texture=texture)
        self.img_ids = [str(k) for k in range(len(self.scene.poses))]

    def get_image(self, img_id):
        return self.scene.render(int(img_id))[0]

    def get_K(self, img_id):
        return self.scene.K.copy()

    def get_pose(self, img_id):
        return self.scene.poses[int(img_id)].copy()

    def get_img_ids(self):
        return self.img_ids.copy()

    def get_mask(self, img_id):
        return self.scene.render(int(img_id))[1]


def normalize_pose(pose, scale, offset):
    """Reference database.py:399-404."""
    R = pose[:3, :3]
    t = pose[:3, 3]
    t_ = R @ -np.asarray(offset) + scale * t
    return np.concatenate([R, t_[:, None]], -1).astype(np.float32)


def denormalize_pose(pose, scale, offset):
    """Reference database.py:406-410."""
    R = pose[:3, :3]
    t = pose[:3, 3]
    t_ = R @ np.asarray(offset) / scale + t / scale
    return np.concatenate([R, t_[:, None]], -1).astype(np.float32)


class NormalizedDatabase(BaseDatabase):
    """Wrap a database so the object fits the unit sphere at the origin
    (reference database.py:667-695)."""

    def __init__(self, database: BaseDatabase):
        super().__init__('norm/' + database.database_name)
        self.database = database
        center = get_object_center(database)
        diameter = get_diameter(database)
        self.scale = 2.0 / diameter
        self.offset = -self.scale * center

    def get_image(self, img_id):
        return self.database.get_image(img_id)

    def get_K(self, img_id):
        return self.database.get_K(img_id)

    def get_pose(self, img_id):
        return normalize_pose(self.database.get_pose(img_id), self.scale,
                              self.offset)

    def get_img_ids(self):
        return self.database.get_img_ids()

    def get_mask(self, img_id):
        return self.database.get_mask(img_id)


def parse_database_name(database_name: str) -> BaseDatabase:
    """Reference database.py:295-309 (+ synthetic)."""
    name2database = {
        'linemod': LINEMODDatabase,
        'genmop': GenMOPDatabase,
        'custom': CustomDatabase,
        'co3d_resize': Co3DResizeDatabase,
        'shapenet': ShapeNetRenderDatabase,
        'gso': GoogleScannedObjectDatabase,
        'synthetic': SyntheticDatabase,
    }
    database_type = database_name.split('/')[0]
    if database_type in name2database:
        return name2database[database_type](database_name)
    raise NotImplementedError(database_name)


def get_database_split(database, split_name):
    """Reference database.py:311-325 (+ synthetic splits: every 4th view is a
    query, the rest are references)."""
    if split_name.startswith('linemod'):
        assert database.database_name.startswith('linemod')
        model_name = database.database_name.split('/')[1]
        lines = np.loadtxt(f'{LINEMOD_ROOT}/{model_name}/test.txt', dtype=str).tolist()
        que_ids = [str(int(l.split('/')[-1].split('.')[0])) for l in lines]
        if split_name == 'linemod_val':
            que_ids = que_ids[::10]
        lines = np.loadtxt(f'{LINEMOD_ROOT}/{model_name}/train.txt', dtype=str).tolist()
        ref_ids = [str(int(l.split('/')[-1].split('.')[0])) for l in lines]
    elif split_name == 'all':
        ref_ids = que_ids = database.get_img_ids()
    elif split_name == 'synthetic_split':
        ids = database.get_img_ids()
        que_ids = ids[::4]
        ref_ids = [i for i in ids if i not in set(que_ids)]
    else:
        raise NotImplementedError(split_name)
    return ref_ids, que_ids


def get_ref_point_cloud(database):
    """Reference database.py:327-344."""
    if isinstance(database, LINEMODDatabase):
        return database.model
    if isinstance(database, GenMOPDatabase):
        return database.meta_info.object_point_cloud
    if isinstance(database, CustomDatabase):
        return database.object_point_cloud
    if isinstance(database, GoogleScannedObjectDatabase):
        return database._object_points()
    if isinstance(database, ShapeNetRenderDatabase):
        return database.model_verts
    if isinstance(database, SyntheticDatabase):
        return database.scene.point_cloud
    if isinstance(database, NormalizedDatabase):
        pc = get_ref_point_cloud(database.database)
        return pc * database.scale + database.offset
    raise NotImplementedError


def get_diameter(database):
    """Reference database.py:346-363."""
    if isinstance(database, LINEMODDatabase):
        model_name = database.database_name.split('/')[-1]
        return np.loadtxt(f'{LINEMOD_ROOT}/{model_name}/distance.txt') / 100
    if isinstance(database, (GenMOPDatabase, CustomDatabase)):
        return 2.0
    if isinstance(database, (GoogleScannedObjectDatabase,
                             ShapeNetRenderDatabase)):
        return database.object_diameter
    if isinstance(database, SyntheticDatabase):
        return database.scene.diameter
    if isinstance(database, NormalizedDatabase):
        return 2.0
    raise NotImplementedError


def get_object_center(database):
    """Reference database.py:365-381."""
    if isinstance(database, LINEMODDatabase):
        return database.object_center
    if isinstance(database, GenMOPDatabase):
        return database.meta_info.center
    if isinstance(database, CustomDatabase):
        return database.center
    if isinstance(database, (GoogleScannedObjectDatabase,
                             ShapeNetRenderDatabase)):
        return database.object_center
    if isinstance(database, SyntheticDatabase):
        return database.scene.center
    if isinstance(database, NormalizedDatabase):
        return np.zeros(3, dtype=np.float32)
    raise NotImplementedError


def get_object_vert(database):
    """Reference database.py:383-397."""
    if isinstance(database, LINEMODDatabase):
        return database.object_vert
    if isinstance(database, (GenMOPDatabase, CustomDatabase)):
        return np.asarray([0, 0, 1], np.float32)
    if isinstance(database, (GoogleScannedObjectDatabase,
                             ShapeNetRenderDatabase)):
        return database.object_vert
    if isinstance(database, SyntheticDatabase):
        return database.scene.vert
    raise NotImplementedError
