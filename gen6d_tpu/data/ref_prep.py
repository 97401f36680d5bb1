"""Reference-view preparation, on device.

Port of reference utils/database_utils.py:8-139 with every cv2 warp replaced by
the XLA homography warp: the look-at-crop math is pure jnp (vmapped over
views), so reference normalization runs as one jitted program at build time and
per refine iteration.
"""
import jax
import jax.numpy as jnp
import numpy as np

from gen6d_tpu.geometry.camera import let_me_look_at_2d, let_me_look_at, project_points
from gen6d_tpu.geometry.fps import sample_fps_points
from gen6d_tpu.geometry.pose import pose_compose, pose_inverse, camera_position
from gen6d_tpu.geometry.rotations import rot_z
from gen6d_tpu.geometry.solvers import scale_rotation_difference_from_cameras
from gen6d_tpu.ops.warp import warp_perspective
from gen6d_tpu.utils.precision import f32


@f32
def look_at_crop_transform(K, pose, position, angle, scale, h, w):
    """The homography/intrinsics/pose algebra of look_at_crop
    (database_utils.py:8-25), without the warp.

    Returns (H, K_new, pose_new, pose_rect).
    """
    R_new, f_new = let_me_look_at_2d(position, K)
    R_new = rot_z(angle) @ R_new
    f_new = f_new * scale
    zeros = jnp.zeros_like(f_new)
    ones = jnp.ones_like(f_new)
    K_new = jnp.stack([
        jnp.stack([f_new, zeros, ones * (w / 2)], -1),
        jnp.stack([zeros, f_new, ones * (h / 2)], -1),
        jnp.stack([zeros, zeros, ones], -1),
    ], -2)
    H = K_new @ R_new @ jnp.linalg.inv(K)
    pose_rect = jnp.concatenate([R_new, jnp.zeros_like(R_new[..., :1])], -1)
    pose_new = pose_compose(pose, pose_rect)
    return H, K_new, pose_new, pose_rect


def look_at_crop(img, K, pose, position, angle, scale, h, w):
    """Device look_at_crop: returns (img_new, K_new, pose_new, pose_rect, H)."""
    H, K_new, pose_new, pose_rect = look_at_crop_transform(
        K, pose, position, angle, scale, h, w)
    img_new = warp_perspective(img, H, (h, w))
    return img_new, K_new, pose_new, pose_rect, H


@f32
def reference_crop_transforms(ref_poses, ref_Ks, object_center, object_diameter,
                              size, margin, object_vert=None, input_pose=None,
                              input_K=None, extra_angle=None):
    """Per-view (angle, scale, position) + look-at-crop transforms for reference
    normalization (database_utils.py:54-96), fully vectorized.

    ref_poses: (rfn,3,4); ref_Ks: (rfn,3,3). Either ``object_vert`` (align the
    object's up axis to image Y-) or ``input_pose``+``input_K`` (align in-plane
    rotation to a given pose) selects the rectification mode. ``extra_angle``
    (scalar or (rfn,)) adds an additional in-plane rotation (used for the
    selector's rotated reference copies).
    Returns (H (rfn,3,3), K_new, pose_new, pose_rect).
    """
    rfn = ref_poses.shape[0]
    cens, _ = jax.vmap(lambda p, k: project_points(object_center[None], p, k))(
        ref_poses, ref_Ks)
    cens = cens[:, 0]
    cams = camera_position(ref_poses)
    dists = jnp.linalg.norm(cams - object_center[None], axis=1)
    focal_look = jax.vmap(lambda p, k: let_me_look_at(p, k, object_center)[1])(
        ref_poses, ref_Ks)
    focal_new = size * (1 - margin) / object_diameter * dists
    scales = focal_new / focal_look

    if input_pose is not None:
        in_poses = jnp.tile(input_pose[None], (rfn, 1, 1))
        in_Ks = jnp.tile(input_K[None], (rfn, 1, 1))
        _, angles = scale_rotation_difference_from_cameras(
            ref_poses, in_poses, ref_Ks, in_Ks, object_center)
    elif object_vert is not None:
        vert2d = jnp.einsum('rij,j->ri', ref_poses[:, :, :3], object_vert)[:, :2]
        norm = jnp.linalg.norm(vert2d, axis=1, keepdims=True)
        # avoid zero vector (database_utils.py:82-83)
        vert2d = jnp.where(norm < 1e-5, vert2d + 1e-5 * jnp.sign(vert2d), vert2d)
        angles = -jnp.arctan2(vert2d[:, 1], vert2d[:, 0]) - jnp.pi / 2
    else:
        angles = jnp.zeros(rfn)
    if extra_angle is not None:
        angles = angles + extra_angle

    return jax.vmap(look_at_crop_transform, in_axes=(0, 0, 0, 0, 0, None, None))(
        ref_Ks, ref_poses, cens, angles, scales, size, size)


def normalize_reference_views_device(ref_imgs, ref_masks, ref_poses, ref_Ks,
                                     object_center, object_diameter, size,
                                     margin, object_vert=None, input_pose=None,
                                     input_K=None, extra_angle=None):
    """Device equivalent of normalize_reference_views (database_utils.py:54-110).

    ref_imgs: (rfn,H,W,3) float [0,1]; ref_masks: (rfn,H,W) float or None.
    Returns (imgs (rfn,size,size,3), masks, Ks, poses, Hs).
    """
    Hs, K_new, pose_new, _ = reference_crop_transforms(
        ref_poses, ref_Ks, object_center, object_diameter, size, margin,
        object_vert, input_pose, input_K, extra_angle)
    # barrier: inside large fused programs XLA otherwise fuses the per-view
    # transform chain into the warp's per-pixel index computation; removing
    # this cost 2.5x end-to-end (11.3 -> 4.5 poses/s)
    Hs = jax.lax.optimization_barrier(Hs)
    warp = jax.vmap(lambda im, h: warp_perspective(im, h, (size, size)))
    imgs = warp(ref_imgs, Hs)
    masks = None
    if ref_masks is not None:
        masks = warp(ref_masks[..., None], Hs)[..., 0]
    return imgs, masks, K_new, pose_new, Hs


def select_reference_img_ids_fps(database, ref_ids_all, ref_num,
                                 random_fps=False):
    """FPS selection of reference views (database_utils.py:112-123). Host-side."""
    from gen6d_tpu.data.database import get_object_center
    object_center = get_object_center(database)
    poses = np.stack([database.get_pose(i) for i in ref_ids_all], 0)
    # host numpy (tiny; eager per-pose TPU dispatch costs seconds per op here)
    cam_pts = -np.einsum('nji,nj->ni', poses[:, :, :3], poses[:, :, 3]) - object_center
    if random_fps:
        idxs = sample_fps_points(cam_pts, ref_num, False, index_model=True)
    else:
        idxs = sample_fps_points(cam_pts, ref_num + 1, True, index_model=True)
    return np.asarray(ref_ids_all)[idxs]


def gather_images(database, img_ids, with_masks=True, as_uint8=False):
    """Host: stack database images (and masks) into float [0,1] arrays.

    File-backed databases decode through the native pthread batch loader
    (native/gen6d_native.cpp:load_jpeg_batch). Measured on this 1-core
    environment: per-decode parity with PIL (both ~25 ms/640x480 jpg, same
    libjpeg); the threaded fan-out pays off on multi-core hosts."""
    imgs = None
    paths = [database.get_image_path(i) for i in img_ids]
    if paths and all(p and p.lower().endswith(('.jpg', '.jpeg'))
                     for p in paths):
        from gen6d_tpu.utils import native
        if native.available():
            decoded, fails = native.load_jpeg_batch(paths)
            if fails == 0 and len({im.shape for im in decoded}) == 1:
                imgs = np.stack(decoded, 0)
    if imgs is None:
        imgs = np.stack([database.get_image(i) for i in img_ids], 0)
    if as_uint8:
        # keep the native uint8: the caller uploads u8 (4x less over the
        # tunneled host->device link) and converts on device. The f32 detour
        # here measured 23s host time for 128x480x640 views (1-core env).
        imgs = imgs if imgs.dtype == np.uint8 else \
            np.clip(imgs * (255.0 if imgs.dtype.kind == 'f' else 1), 0,
                    255).astype(np.uint8)
    else:
        imgs = imgs.astype(np.float32) / 255.0
    masks = None
    if with_masks:
        masks = np.stack([database.get_mask(i).astype(np.float32)
                          for i in img_ids], 0)
    poses = np.stack([database.get_pose(i) for i in img_ids], 0).astype(np.float32)
    Ks = np.stack([database.get_K(i) for i in img_ids], 0).astype(np.float32)
    return imgs, masks, poses, Ks
