"""Training batch builders.

TPU-first redesign of the reference's DataLoader datasets
(dataset/train_dataset.py): instead of cv2 warps in CPU worker processes, the
raw posed views are staged on device ONCE and every batch is built by a jitted
program of homography warps + compositing — an on-device augmentation pipeline.
The GT label math matches the reference:

- detection: query = look-at warp of a random view with scale/rotation/offset
  augmentation onto a random background; GT center via the warp, GT scale from
  the camera-derived similarity (train_dataset.py:599-656 via
  scale_rotation_difference_from_cameras);
- selection: query crops with in-plane rotation/scale augmentation; GT view
  scores = normalized view correlations; GT angle from the camera similarity
  (train_dataset.py:914-988);
- refinement: input pose from a nearby view, query warped to look at the input
  pose with scale/rot/offset noise, GT similarity transform via
  approximate_rigid_to_similarity (train_dataset.py:1185-1355).

Synthetic scenes only in this round (no GSO/ShapeNet/CO3D data ships with the
environment); the builders take any BaseDatabase, so real databases plug in
unchanged.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from gen6d_tpu.data import database as dbm
from gen6d_tpu.data import ref_prep as rp
from gen6d_tpu.data.ref_prep import (look_at_crop_transform,
                                     normalize_reference_views_device)
from gen6d_tpu.geometry.camera import (let_me_look_at, let_me_look_at_2d,
                                       project_points, view_correlation)
from gen6d_tpu.geometry.pose import camera_position, pose_compose
from gen6d_tpu.geometry.rotations import rot_z
from gen6d_tpu.geometry.solvers import (approximate_rigid_to_similarity,
                                        scale_rotation_difference_from_cameras)
from gen6d_tpu.ops.warp import warp_perspective


def _make_K(f, size):
    """Square pinhole K with focal f and principal point size/2 (traced f)."""
    z = jnp.zeros(())
    o = jnp.ones(())
    half = jnp.full((), size / 2.0)
    return jnp.stack([jnp.stack([f, z, half]),
                      jnp.stack([z, f, half]),
                      jnp.stack([z, z, o])])


class SyntheticTrainData:
    """Stages a posed-view pool on device and builds batches with jitted warps."""

    def __init__(self, database=None, n_views=96, ref_num=32, size=128,
                 margin=0.05, seed=0):
        if database is None:
            database = dbm.parse_database_name(f'synthetic/{n_views}@{seed}')
        self.database = database
        self.size = size
        self.margin = margin
        self.center = jnp.asarray(dbm.get_object_center(database), jnp.float32)
        self.vert = jnp.asarray(dbm.get_object_vert(database), jnp.float32)
        self.diameter = float(dbm.get_diameter(database))

        ids = database.get_img_ids()
        imgs, masks, poses, Ks = rp.gather_images(database, ids)
        self.imgs = jnp.asarray(imgs)
        self.masks = jnp.asarray(masks)
        self.poses = jnp.asarray(poses)
        self.Ks = jnp.asarray(Ks)

        # fixed reference set (fps), normalized crops — shared by det/sel
        ref_ids = rp.select_reference_img_ids_fps(database, ids, ref_num)
        ridx = np.asarray([ids.index(i) for i in ref_ids])
        self.ref_idx = jnp.asarray(ridx)

        @jax.jit
        def build_refs(imgs, masks, poses, Ks):
            return normalize_reference_views_device(
                imgs, masks, poses, Ks, self.center, self.diameter, size,
                margin, object_vert=self.vert)

        (self.ref_crops, self.ref_crop_masks, self.ref_Ks_new,
         self.ref_poses_new, self.ref_Hs) = build_refs(
            self.imgs[self.ref_idx], self.masks[self.ref_idx],
            self.poses[self.ref_idx], self.Ks[self.ref_idx])

        # refiner batches work in NormalizedDatabase units (object scaled to
        # the unit sphere: diameter 2, center 0) exactly like the reference
        # (train_dataset.py:1445-1446) and like inference (refiner.py:289-290)
        from gen6d_tpu.geometry.pose import normalize_pose
        self.norm_scale = 2.0 / self.diameter
        self.norm_offset = -self.norm_scale * np.asarray(self.center)
        poses_norm = jax.vmap(normalize_pose, in_axes=(0, None, None))(
            self.poses, self.norm_scale, jnp.asarray(self.norm_offset))

        # the staged arrays, passed as ARGS to the jitted batch builders (NOT
        # closed over: a static `self` embeds them as HLO constants and the
        # 96-view pool alone is ~354MB -> remote-compile upload rejected)
        self.pool = {'imgs': self.imgs, 'masks': self.masks,
                     'poses': self.poses, 'Ks': self.Ks,
                     'poses_norm': poses_norm,
                     'ref_crops': self.ref_crops,
                     'ref_poses_new': self.ref_poses_new,
                     'ref_Ks_new': self.ref_Ks_new,
                     'ref_idx': self.ref_idx}
        self._jits = {}

    def _jit(self, name, fn, static):
        if name not in self._jits:
            self._jits[name] = jax.jit(fn, static_argnums=static)
        return self._jits[name]

    # -------------------------------------------------------------- detection
    def det_batch(self, key, qn=4, que_size=512):
        """-> {'ref_imgs', 'que_imgs', 'cens', 'scale_diff'} (detector step).

        Query = look-at warp of a random raw view: base scale fills the crop
        like a reference view, then scale aug 2^[-0.5,1.2], rotation aug
        +-22.5deg, random center offset; composited onto a random-color
        background (train_dataset.py:432-597 semantics, device-side).
        """
        fn = self._jit('det', self._det_batch_impl, static=(2, 3))
        return fn(key, self.pool, qn, que_size)

    def _det_batch_impl(self, key, pool, qn, que_size):
        keys = jax.random.split(key, 6)
        vi = jax.random.randint(keys[0], (qn,), 0, pool['imgs'].shape[0])
        # scale prior 2^[-0.5, 1.2] (reference train_dataset.py:438)
        scale_aug = 2.0 ** jax.random.uniform(keys[1], (qn,), minval=-0.5,
                                              maxval=1.2)
        rot_aug = jnp.deg2rad(jax.random.uniform(keys[2], (qn,), minval=-22.5,
                                                 maxval=22.5))
        # keep the (augmented) object inside the query image
        off_aug = jax.random.uniform(keys[3], (qn, 2), minval=0.25 * que_size,
                                     maxval=0.75 * que_size)
        bg = jax.random.uniform(keys[4], (qn, 1, 1, 3))

        def build_one(img, mask, pose, K, s_aug, r_aug, off):
            cen, _ = project_points(self.center[None], pose, K)
            dist = jnp.linalg.norm(camera_position(pose) - self.center)
            _, f_look = let_me_look_at(pose, K, self.center)
            f_new = self.size * (1 - self.margin) / self.diameter * dist
            base_scale = f_new / f_look
            H, K_new, pose_new, _ = look_at_crop_transform(
                K, pose, cen[0], r_aug, base_scale * s_aug, que_size, que_size)
            # shift the principal point so the object lands at `off`
            shift = jnp.eye(3).at[:2, 2].set(off - que_size / 2.0)
            H = shift @ H
            K_new = shift @ K_new
            img_w = warp_perspective(img, H, (que_size, que_size))
            mask_w = warp_perspective(mask[..., None], H, (que_size, que_size))
            return img_w, mask_w, K_new, pose_new, off

        img_w, mask_w, K_new, pose_new, cens = jax.vmap(build_one)(
            pool['imgs'][vi], pool['masks'][vi], pool['poses'][vi],
            pool['Ks'][vi], scale_aug, rot_aug, off_aug)
        que_imgs = img_w * mask_w + bg * (1 - mask_w)

        # GT scale: camera similarity from the normalized ref convention to the
        # augmented query (que_ref_scale_rotation_from_poses semantics)
        corr = view_correlation(pose_new, pool['ref_poses_new'], self.center)
        gt_ref = jnp.argmax(corr, 1)
        scale_diff, _ = scale_rotation_difference_from_cameras(
            pool['ref_poses_new'][gt_ref], pose_new, pool['ref_Ks_new'][gt_ref],
            K_new, self.center)
        return {'ref_imgs': pool['ref_crops'], 'que_imgs': que_imgs,
                'cens': cens, 'scale_diff': scale_diff}

    # -------------------------------------------------------------- selection
    def sel_batch(self, key, qn=4):
        """-> selector train-step batch. Query crops around the object with
        scale 2^[-0.3,0.3] and in-plane rotation +-90deg augmentation; GT view
        scores = view correlations, GT angle from the camera similarity
        (train_dataset.py:810-1061 semantics)."""
        fn = self._jit('sel', self._sel_batch_impl, static=(2,))
        return fn(key, self.pool, qn)

    def _sel_batch_impl(self, key, pool, qn):
        keys = jax.random.split(key, 4)
        vi = jax.random.randint(keys[0], (qn,), 0, pool['imgs'].shape[0])
        scale_aug = 2.0 ** jax.random.uniform(keys[1], (qn,), minval=-0.3,
                                              maxval=0.3)
        rot_aug = jax.random.uniform(keys[2], (qn,), minval=-jnp.pi / 2,
                                     maxval=jnp.pi / 2)

        def build_one(img, pose, K, s_aug, r_aug):
            cen, _ = project_points(self.center[None], pose, K)
            dist = jnp.linalg.norm(camera_position(pose) - self.center)
            _, f_look = let_me_look_at(pose, K, self.center)
            f_new = self.size * (1 - self.margin) / self.diameter * dist
            base_scale = f_new / f_look
            H, K_new, pose_new, _ = look_at_crop_transform(
                K, pose, cen[0], r_aug, base_scale * s_aug, self.size, self.size)
            return warp_perspective(img, H, (self.size, self.size)), K_new, pose_new

        que_imgs, que_Ks, que_poses = jax.vmap(build_one)(
            pool['imgs'][vi], pool['poses'][vi], pool['Ks'][vi], scale_aug,
            rot_aug)

        # rotated reference copies (an=5) — the selector's ref bank
        angles = jnp.asarray([-jnp.pi / 2, -jnp.pi / 4, 0.0, jnp.pi / 4,
                              jnp.pi / 2])

        def rot_refs(angle):
            imgs, _, _, _, _ = normalize_reference_views_device(
                pool['imgs'][pool['ref_idx']], None,
                pool['poses'][pool['ref_idx']], pool['Ks'][pool['ref_idx']],
                self.center, self.diameter, self.size, self.margin,
                object_vert=self.vert, extra_angle=angle)
            return imgs

        ref_imgs = jax.vmap(rot_refs)(angles)  # an,rfn,h,w,3

        scores = view_correlation(que_poses, pool['ref_poses_new'], self.center)
        gt_ref_ids = jnp.argmax(scores, 1)
        _, angles_r2q = scale_rotation_difference_from_cameras(
            pool['ref_poses_new'][gt_ref_ids], que_poses,
            pool['ref_Ks_new'][gt_ref_ids], que_Ks, self.center)
        return {'ref_imgs': ref_imgs, 'ref_poses': pool['ref_poses_new'],
                'object_center': self.center, 'object_vert': self.vert,
                'que_imgs': que_imgs, 'ref_vp_scores': scores,
                'angles_r2q': angles_r2q, 'gt_ref_ids': gt_ref_ids}

    # ------------------------------------------------------------- refinement
    def ref_batch(self, key, qn=2, ref_num=6):
        """-> refiner train-step batch (train_dataset.py:1243-1396 semantics,
        device-side): input pose = nearby view (top-8 by correlation), query
        warped to look at the input pose with scale 2^[-0.3,0.3] / rot +-15deg /
        offset N(0,4) noise; GT = approximate_rigid_to_similarity."""
        fn = self._jit('ref', self._ref_batch_impl, static=(2, 3))
        return fn(key, self.pool, qn, ref_num)

    def _ref_batch_impl(self, key, pool, qn, ref_num):
        size = self.size
        margin = self.margin
        # normalized-object units (diameter 2, center 0) throughout
        diameter = 2.0
        center = jnp.zeros(3)
        keys = jax.random.split(key, 6)
        vi = jax.random.randint(keys[0], (qn,), 0, pool['imgs'].shape[0])
        scale_aug = 2.0 ** jax.random.uniform(keys[1], (qn,), minval=-0.3,
                                              maxval=0.3)
        rot_aug = jnp.deg2rad(jax.random.uniform(keys[2], (qn,), minval=-15.0,
                                                 maxval=15.0))
        off_aug = 4.0 * jax.random.normal(keys[3], (qn, 2))
        pick = jax.random.randint(keys[4], (qn,), 0, 8)

        def build_one(qi, s_aug, r_aug, off, pk):
            que_pose = pool['poses_norm'][qi]
            que_K = pool['Ks'][qi]
            que_img = pool['imgs'][qi]
            # input pose: one of the top-8 correlated views
            corr = view_correlation(que_pose[None], pool['poses_norm'], center)[0]
            _, top = jax.lax.top_k(corr, 8)
            ii = top[pk]
            input_pose_raw = pool['poses_norm'][ii]
            input_K_raw = pool['Ks'][ii]

            # rectify input to look at the object at canonical scale
            # (train_dataset.py:1260-1272)
            input_dist = jnp.linalg.norm(camera_position(input_pose_raw) - center)
            R_look, _ = let_me_look_at(input_pose_raw, input_K_raw, center)
            input_pose = pose_compose(
                input_pose_raw, jnp.concatenate([R_look, jnp.zeros((3, 1))], 1))
            f_in = size * (1 - margin) / diameter * input_dist
            input_K = _make_K(f_in, size)

            scale_diff, angle_diff = scale_rotation_difference_from_cameras(
                input_pose[None], que_pose[None], input_K[None], que_K[None],
                center)
            scale_diff, angle_diff = scale_diff[0], angle_diff[0]

            # warp query (train_dataset.py:1274-1293)
            que_cen, _ = project_points(center[None], que_pose, que_K)
            R_new, f_new = let_me_look_at_2d(que_cen[0] + off, que_K)
            angle = r_aug - angle_diff
            R_new = rot_z(angle) @ R_new
            f_new = f_new * s_aug / scale_diff
            que_K_warp = _make_K(f_new, size)
            H = que_K_warp @ R_new @ jnp.linalg.inv(que_K)
            que_img_warp = warp_perspective(que_img, H, (size, size))
            pose_rect = jnp.concatenate([R_new, jnp.zeros((3, 1))], 1)
            que_pose_warp = pose_compose(que_pose, pose_rect)
            pose_sim = approximate_rigid_to_similarity(
                input_pose, que_pose_warp, input_K, que_K_warp, center)

            # reference views near the input pose (train_dataset.py:1357-1396)
            corr_r = view_correlation(input_pose[None], pool['poses_norm'], center)[0]
            _, ridx = jax.lax.top_k(corr_r, ref_num)
            ref_crops, _, ref_Ks_new, ref_poses_new, _ = normalize_reference_views_device(
                pool['imgs'][ridx], None, pool['poses_norm'][ridx], pool['Ks'][ridx],
                center, diameter, size, margin,
                input_pose=input_pose, input_K=input_K)
            return (que_img_warp, que_K_warp, input_pose, pose_sim,
                    que_pose_warp, ref_crops, ref_poses_new, ref_Ks_new)

        (que_imgs, que_Ks_in, poses_in, poses_sim, poses_warp, ref_imgs,
         ref_poses, ref_Ks) = jax.vmap(build_one)(vi, scale_aug, rot_aug,
                                                  off_aug, pick)
        return {'que_imgs': que_imgs, 'que_Ks_in': que_Ks_in,
                'que_poses_in': poses_in, 'ref_imgs': ref_imgs,
                'ref_poses': ref_poses, 'ref_Ks': ref_Ks,
                'object_center': jnp.zeros((qn, 3)),
                'poses_sim_in_to_que': poses_sim,
                'que_poses_warp': poses_warp}
