"""COLMAP sparse-model reader (binary and text), replacing the vendored
utils/read_write_model.py of the reference. Only what the databases need:
cameras (intrinsics), images (poses + names), points3D (xyz).

Format per the public COLMAP documentation (sparse reconstruction files).
"""
import os
import struct
from dataclasses import dataclass

import numpy as np

# camera model id -> (name, num_params)
CAMERA_MODELS = {
    0: ('SIMPLE_PINHOLE', 3), 1: ('PINHOLE', 4), 2: ('SIMPLE_RADIAL', 4),
    3: ('RADIAL', 5), 4: ('OPENCV', 8), 5: ('OPENCV_FISHEYE', 8),
    6: ('FULL_OPENCV', 12), 7: ('FOV', 5), 8: ('SIMPLE_RADIAL_FISHEYE', 4),
    9: ('RADIAL_FISHEYE', 5), 10: ('THIN_PRISM_FISHEYE', 12),
}


@dataclass
class Camera:
    id: int
    model: str
    width: int
    height: int
    params: np.ndarray

    def K(self):
        p = self.params
        if self.model == 'SIMPLE_PINHOLE' or self.model == 'SIMPLE_RADIAL':
            f, cx, cy = p[0], p[1], p[2]
            return np.array([[f, 0, cx], [0, f, cy], [0, 0, 1]], np.float32)
        if self.model in ('PINHOLE', 'OPENCV', 'FULL_OPENCV'):
            fx, fy, cx, cy = p[0], p[1], p[2], p[3]
            return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
        raise NotImplementedError(self.model)


@dataclass
class Image:
    id: int
    qvec: np.ndarray    # w, x, y, z
    tvec: np.ndarray
    camera_id: int
    name: str

    def pose(self):
        """World->camera [3,4]."""
        R = qvec2rotmat(self.qvec)
        return np.concatenate([R, self.tvec[:, None]], 1).astype(np.float32)


def qvec2rotmat(q):
    """w-first quaternion -> rotation matrix (COLMAP convention)."""
    w, x, y, z = q
    return np.array([
        [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w],
        [2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * x * w],
        [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x * x - 2 * y * y]])


def rotmat2qvec(R):
    """Rotation matrix -> w-first quaternion."""
    K = np.array([
        [R[0, 0] - R[1, 1] - R[2, 2], 0, 0, 0],
        [R[0, 1] + R[1, 0], R[1, 1] - R[0, 0] - R[2, 2], 0, 0],
        [R[0, 2] + R[2, 0], R[1, 2] + R[2, 1], R[2, 2] - R[0, 0] - R[1, 1], 0],
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1],
         R[0, 0] + R[1, 1] + R[2, 2]]]) / 3.0
    w, V = np.linalg.eigh(K)
    q = V[[3, 0, 1, 2], np.argmax(w)]
    return -q if q[0] < 0 else q


def _read(f, fmt):
    return struct.unpack(fmt, f.read(struct.calcsize(fmt)))


def read_cameras_binary(path):
    cams = {}
    with open(path, 'rb') as f:
        (n,) = _read(f, '<Q')
        for _ in range(n):
            cid, model_id, w, h = _read(f, '<iiQQ')
            name, np_ = CAMERA_MODELS[model_id]
            params = np.array(_read(f, '<' + 'd' * np_))
            cams[cid] = Camera(cid, name, w, h, params)
    return cams


def read_images_binary(path):
    imgs = {}
    with open(path, 'rb') as f:
        (n,) = _read(f, '<Q')
        for _ in range(n):
            iid = _read(f, '<i')[0]
            qvec = np.array(_read(f, '<dddd'))
            tvec = np.array(_read(f, '<ddd'))
            cam_id = _read(f, '<i')[0]
            name = b''
            while True:
                c = f.read(1)
                if c == b'\x00':
                    break
                name += c
            (npts,) = _read(f, '<Q')
            f.read(24 * npts)  # skip 2D points (x, y, point3D_id)
            imgs[iid] = Image(iid, qvec, tvec, cam_id, name.decode('utf-8'))
    return imgs


def read_points3d_binary(path):
    xyz, rgb, ids = [], [], []
    with open(path, 'rb') as f:
        (n,) = _read(f, '<Q')
        for _ in range(n):
            pid = _read(f, '<Q')[0]
            p = _read(f, '<ddd')
            c = _read(f, '<BBB')
            _read(f, '<d')  # error
            (track_len,) = _read(f, '<Q')
            f.read(8 * track_len)
            xyz.append(p)
            rgb.append(c)
            ids.append(pid)
    return (np.asarray(xyz, np.float32), np.asarray(rgb, np.uint8),
            np.asarray(ids, np.int64))


def read_model(sparse_dir):
    """Read a COLMAP sparse model directory -> (cameras, images, points3D)."""
    cams = read_cameras_binary(os.path.join(sparse_dir, 'cameras.bin'))
    imgs = read_images_binary(os.path.join(sparse_dir, 'images.bin'))
    pts_path = os.path.join(sparse_dir, 'points3D.bin')
    pts = read_points3d_binary(pts_path) if os.path.exists(pts_path) else None
    return cams, imgs, pts


# ------------------------------------------------------------------ writers
# Binary writers completing the custom-object round-trip (parity with the
# reference's vendored utils/read_write_model.py:419-484).

_MODEL_IDS = {name: (mid, np_) for mid, (name, np_) in CAMERA_MODELS.items()}


def _write(f, fmt, *vals):
    f.write(struct.pack(fmt, *vals))


def write_cameras_binary(cams, path):
    """cams: {id: Camera} -> cameras.bin."""
    with open(path, 'wb') as f:
        _write(f, '<Q', len(cams))
        for cam in cams.values():
            mid, np_ = _MODEL_IDS[cam.model]
            _write(f, '<iiQQ', cam.id, mid, int(cam.width), int(cam.height))
            params = np.asarray(cam.params, np.float64)
            assert len(params) == np_, (cam.model, len(params))
            _write(f, '<' + 'd' * np_, *params.tolist())


def write_images_binary(imgs, path):
    """imgs: {id: Image} -> images.bin (no 2D point tracks)."""
    with open(path, 'wb') as f:
        _write(f, '<Q', len(imgs))
        for im in imgs.values():
            _write(f, '<i', im.id)
            _write(f, '<dddd', *np.asarray(im.qvec, np.float64).tolist())
            _write(f, '<ddd', *np.asarray(im.tvec, np.float64).tolist())
            _write(f, '<i', im.camera_id)
            f.write(im.name.encode('utf-8') + b'\x00')
            _write(f, '<Q', 0)  # no 2D points


def write_points3d_binary(xyz, rgb, path, ids=None, errors=None):
    """xyz (n,3), rgb (n,3) uint8 -> points3D.bin (empty tracks)."""
    n = len(xyz)
    ids = ids if ids is not None else np.arange(n)
    errors = errors if errors is not None else np.full(n, -1.0)
    with open(path, 'wb') as f:
        _write(f, '<Q', n)
        for i in range(n):
            _write(f, '<Q', int(ids[i]))
            _write(f, '<ddd', *np.asarray(xyz[i], np.float64).tolist())
            _write(f, '<BBB', *np.asarray(rgb[i], np.uint8).tolist())
            _write(f, '<d', float(errors[i]))
            _write(f, '<Q', 0)  # empty track


def write_model(cams, imgs, pts, sparse_dir):
    """Write a COLMAP sparse model directory (cameras/images/points3D.bin).

    ``pts``: (xyz, rgb, ids) like read_points3d_binary returns, or None.
    Round-trips with read_model.
    """
    os.makedirs(sparse_dir, exist_ok=True)
    write_cameras_binary(cams, os.path.join(sparse_dir, 'cameras.bin'))
    write_images_binary(imgs, os.path.join(sparse_dir, 'images.bin'))
    if pts is not None:
        xyz, rgb, ids = pts
        write_points3d_binary(xyz, rgb,
                              os.path.join(sparse_dir, 'points3D.bin'),
                              ids=ids)
