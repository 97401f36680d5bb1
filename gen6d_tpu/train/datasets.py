"""Training batch builders.

TPU-first redesign of the reference's DataLoader datasets
(dataset/train_dataset.py): instead of cv2 warps in CPU worker processes, the
raw posed views of a MULTI-OBJECT scene pool are staged on device ONCE (uint8)
and every batch is built by a jitted program of homography warps, background
compositing, distractor pasting and photometric augmentation — an on-device
augmentation pipeline. The GT label math matches the reference:

- detection: query = look-at warp of a random view with scale 2^[-0.5,1.2] /
  rotation +-22.5deg / offset augmentation (train_dataset.py:432-724),
  composited over procedural backgrounds with distractor objects pasted in
  (:374-408,580-597); GT center via the warp, GT scale from the camera-derived
  similarity (:599-656);
- selection: query crops with in-plane rotation/scale augmentation; GT view
  scores = normalized view correlations; GT angle from the camera similarity
  (train_dataset.py:914-988);
- refinement: input pose from a nearby view, query warped to look at the input
  pose with scale/rot/offset noise, GT similarity transform via
  approximate_rigid_to_similarity (train_dataset.py:1185-1355).

The scene pool is the multi-dataset sampling machinery
(train_dataset.py:240-258): each batch samples one scene uniformly; the
default train/val/eval scene lists are DISJOINT (shape, texture) combinations,
so evaluation runs on never-seen objects — the GSO/ShapeNet stand-in
(reference dataset/database.py:412-665). Real databases plug in unchanged via
``scenes=[database names]``.
"""
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
from gen6d_tpu.geometry.rotations import quat_to_mat, rot_z
from gen6d_tpu.geometry.solvers import (approximate_rigid_to_similarity,
                                        scale_rotation_difference_from_cameras)
from gen6d_tpu.ops.image import resize_bilinear
from gen6d_tpu.ops.warp import warp_perspective
from gen6d_tpu.train.augment import octave_background, photometric_aug

# disjoint (shape, texture) pools: eval objects are never seen in training
DEFAULT_TRAIN_SCENES = ('cuboid-checks@1', 'oct-stripes@2', 'prism-noise@3',
                        'ico-blobs@4', 'tet-checks@5', 'slab-stripes@6',
                        'cube-stripes@7', 'cuboid-noise@8')
DEFAULT_VAL_SCENES = ('prism-blobs@9',)
# held-out eval object: synthetic/<n> = cube-checks@0 (combo absent above)


def _make_K(f, size):
    """Square pinhole K with focal f and principal point size/2 (traced f)."""
    z = jnp.zeros(())
    o = jnp.ones(())
    half = jnp.full((), size / 2.0)
    return jnp.stack([jnp.stack([f, z, half]),
                      jnp.stack([z, f, half]),
                      jnp.stack([z, z, o])])


class SyntheticTrainData:
    """Stages a posed-view scene pool on device and builds augmented batches
    with jitted warps.

    ``scenes``: list of database names (or BaseDatabase objects); every scene
    must share image size and view count. ``augment``/``distractors`` gate the
    photometric bank / distractor pasting (off for val-style clean batches).
    """

    def __init__(self, database=None, n_views=64, ref_num=32, size=128,
                 margin=0.05, seed=0, scenes=None, augment=True,
                 distractors=True, ref_scale_noise=0.3, ref_rot_noise=15.0,
                 ref_off_std=4.0, ref_narrow_frac=0.0, ref_gt_init_frac=0.0,
                 ref_vp_noise=10.0, max_staged_views=None,
                 scene_probs=None, background_dir=None,
                 background_pool_size=64, background_res=512):
        # refiner input-pose noise basin (reference train_dataset.py:1274-1293
        # uses 2^+-0.3 / +-15deg / N(0,4)px); configurable so the basin can be
        # widened to cover the measured detector+selector initialization error
        self.ref_scale_noise = float(ref_scale_noise)
        self.ref_rot_noise = float(ref_rot_noise)
        self.ref_off_std = float(ref_off_std)
        self.ref_narrow_frac = float(ref_narrow_frac)
        # ref_gt_init_frac: probability that a refiner sample's INPUT pose is
        # the GT query pose orbited by a random rotation of U(0, ref_vp_noise)
        # deg, instead of a top-8-correlated REFERENCE VIEW (the reference's
        # only mode, train_dataset.py:1243-1272). The reference-view mode
        # carries a 15-30 deg out-of-plane viewpoint gap that none of the
        # warp-noise knobs control — but the serving refine loop's later
        # iterations feed back the previous OUTPUT pose, whose viewpoint gap
        # is a few degrees. Without this mode the rotation head never trains
        # near identity (docs/refiner_head_jitter.md: 5 deg bias at GT init).
        self.ref_gt_init_frac = float(ref_gt_init_frac)
        self.ref_vp_noise = float(ref_vp_noise)
        if database is not None:
            dbs = [database]
        else:
            if scenes is None:
                scenes = DEFAULT_TRAIN_SCENES
            dbs = []
            for s in scenes:
                if isinstance(s, dbm.BaseDatabase):
                    dbs.append(s)
                    continue
                if '/' not in s:
                    # shorthand '<shape>-<texture>@<seed>' -> synthetic scene
                    # with this pool's view count
                    obj, _, seed_s = s.partition('@')
                    s = f'synthetic/{n_views}' + \
                        (f'@{seed_s}' if seed_s else '') + f':{obj}'
                dbs.append(dbm.parse_database_name(s))
        self.databases = dbs
        self.database = dbs[0]  # back-compat (single-scene callers)
        self.size = size
        self.margin = margin
        self.augment = augment
        self.distractors = distractors
        # streaming: scenes larger than ``max_staged_views`` stage only a
        # rotating window of raw views (FPS reference views pinned + a random
        # fill refreshed by ``restage()``), bounding device HBM per scene —
        # the reference streams per-item from DataLoader workers instead
        # (train_dataset.py:99-119); here the window refresh goes through the
        # native pthread batch loader (ref_prep.gather_images).
        self.max_staged_views = max_staged_views
        self._stream_state = []
        self._restage_rng = np.random.RandomState(seed + 777)

        # per-scene sampling probabilities (reference samples datasets with
        # configured probabilities, train_dataset.py:240-258; uniform default)
        if scene_probs is not None:
            p = np.asarray(scene_probs, np.float32)
            if p.shape != (len(dbs),):
                raise ValueError(f'scene_probs has {p.shape[0]} entries for '
                                 f'{len(dbs)} scenes')
            self._scene_logits = jnp.log(jnp.asarray(p / p.sum()))
        else:
            self._scene_logits = None

        # real-image background pool (reference composites COCO/SUN crops,
        # train_dataset.py:99-119,260-291); staged on device once as uint8,
        # random crops taken in-graph. Falls back to procedural octave noise
        # when no directory is given (no real data ships with this env).
        self.bg_pool = None
        if background_dir is not None:
            self.bg_pool = self._stage_backgrounds(
                background_dir, background_pool_size, background_res, seed)

        pools = []
        for db in dbs:
            pools.append(self._stage_scene(db, ref_num, size, margin,
                                           scene_index=len(pools)))
        # stack along a leading scene axis
        self.pool = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *pools)
        if self.bg_pool is not None:
            # ride in the pool dict so jitted batch impls take it as an
            # argument (a closed-over 50 MB uint8 constant would be embedded
            # in every compiled program otherwise)
            self.pool['bg'] = self.bg_pool
        # back-compat single-scene attributes (tests, trainer val metrics)
        self.center = self.pool['center'][0]
        self.vert = self.pool['vert'][0]
        self.diameter = float(self.pool['diameter'][0])
        self._jits = {}

    def _stage_scene(self, db, ref_num, size, margin, scene_index=0):
        center = np.asarray(dbm.get_object_center(db), np.float32)
        vert = np.asarray(dbm.get_object_vert(db), np.float32)
        diameter = float(dbm.get_diameter(db))
        all_ids = db.get_img_ids()
        ref_ids = rp.select_reference_img_ids_fps(db, all_ids, ref_num)
        msv = self.max_staged_views
        if msv is not None and len(all_ids) > msv:
            # bounded window: FPS reference views pinned at the front, the
            # remaining slots hold a rotating random subset of the other views
            assert msv > len(ref_ids), (msv, len(ref_ids))
            fill_pool = [i for i in all_ids if i not in set(ref_ids)]
            fill = list(self._restage_rng.choice(
                np.asarray(fill_pool, object), msv - len(ref_ids),
                replace=False))
            ids = list(ref_ids) + fill
            self._stream_state.append({
                'db': db, 'scene_index': scene_index, 'fill_pool': fill_pool,
                'slots': np.arange(len(ref_ids), msv),
                'norm': (2.0 / diameter, (-2.0 / diameter) * center)})
        else:
            ids = all_ids
        imgs, masks, poses, Ks = rp.gather_images(db, ids)
        imgs_u8 = jnp.asarray((imgs * 255).astype(np.uint8))
        masks_u8 = jnp.asarray(masks.astype(np.uint8))
        poses = jnp.asarray(poses)
        Ks = jnp.asarray(Ks)

        ridx = jnp.asarray([ids.index(i) for i in ref_ids])

        @jax.jit
        def build_refs(imgs, masks, poses, Ks, center, vert, diameter):
            return normalize_reference_views_device(
                imgs, masks, poses, Ks, center, diameter, size, margin,
                object_vert=vert)

        ref_crops, ref_crop_masks, ref_Ks_new, ref_poses_new, _ = build_refs(
            jnp.asarray(imgs[np.asarray(ridx)]),
            jnp.asarray(masks[np.asarray(ridx)]),
            poses[ridx], Ks[ridx], jnp.asarray(center), jnp.asarray(vert),
            diameter)

        # refiner batches work in NormalizedDatabase units (object scaled to
        # the unit sphere: diameter 2, center 0) exactly like the reference
        # (train_dataset.py:1445-1446) and like inference (refiner.py:289-290)
        from gen6d_tpu.geometry.pose import normalize_pose
        norm_scale = 2.0 / diameter
        norm_offset = -norm_scale * center
        poses_norm = jax.vmap(normalize_pose, in_axes=(0, None, None))(
            poses, norm_scale, jnp.asarray(norm_offset))

        return {'imgs': imgs_u8, 'masks': masks_u8, 'poses': poses, 'Ks': Ks,
                'poses_norm': poses_norm, 'ref_crops': ref_crops,
                'ref_crop_masks': ref_crop_masks,
                'ref_poses_new': ref_poses_new, 'ref_Ks_new': ref_Ks_new,
                'ref_idx': ridx, 'center': jnp.asarray(center),
                'vert': jnp.asarray(vert),
                'diameter': jnp.asarray(diameter, jnp.float32)}

    def restage(self):
        """Refresh the streamed view windows: load a new random fill subset of
        every streaming scene from disk (native pthread loader for file-backed
        databases) and swap it into the staged device pool in place (same
        shapes/dtypes — no recompilation of the jitted batch builders).
        Returns the number of views swapped."""
        from gen6d_tpu.geometry.pose import normalize_pose
        swapped = 0
        for st in self._stream_state:
            slots = st['slots']
            new_ids = list(self._restage_rng.choice(
                np.asarray(st['fill_pool'], object), len(slots),
                replace=False))
            imgs, masks, poses, Ks = rp.gather_images(st['db'], new_ids)
            si = st['scene_index']
            sl = jnp.asarray(slots)
            norm_scale, norm_offset = st['norm']
            poses = jnp.asarray(poses)
            poses_norm = jax.vmap(normalize_pose, in_axes=(0, None, None))(
                poses, norm_scale, jnp.asarray(norm_offset))
            p = self.pool
            p['imgs'] = p['imgs'].at[si, sl].set(
                jnp.asarray((imgs * 255).astype(np.uint8)))
            p['masks'] = p['masks'].at[si, sl].set(
                jnp.asarray(masks.astype(np.uint8)))
            p['poses'] = p['poses'].at[si, sl].set(poses)
            p['poses_norm'] = p['poses_norm'].at[si, sl].set(poses_norm)
            p['Ks'] = p['Ks'].at[si, sl].set(jnp.asarray(Ks))
            swapped += len(slots)
        return swapped

    def _jit(self, name, fn, static):
        if name not in self._jits:
            self._jits[name] = jax.jit(fn, static_argnums=static)
        return self._jits[name]

    @staticmethod
    def _to_f32(u8):
        return u8.astype(jnp.float32) / 255.0

    def _rand_scene(self, key):
        if self._scene_logits is not None:
            return jax.random.categorical(key, self._scene_logits)
        return jax.random.randint(key, (), 0, self.pool['imgs'].shape[0])

    @staticmethod
    def _stage_backgrounds(background_dir, pool_size, res, seed):
        """Load up to ``pool_size`` images from ``background_dir``, resize to
        res x res, stage on device as one uint8 (B,res,res,3) array."""
        import os

        from PIL import Image as PILImage
        exts = ('.jpg', '.jpeg', '.png', '.bmp', '.webp')
        files = sorted(f for f in os.listdir(background_dir)
                       if f.lower().endswith(exts))
        if not files:
            raise ValueError(f'no background images in {background_dir}')
        rng = np.random.RandomState(seed + 888)
        if len(files) > pool_size:
            files = [files[i] for i in
                     rng.choice(len(files), pool_size, replace=False)]
        imgs = []
        for f in files:
            im = PILImage.open(os.path.join(background_dir, f)).convert('RGB')
            imgs.append(np.asarray(im.resize((res, res),
                                             PILImage.BILINEAR), np.uint8))
        return jnp.asarray(np.stack(imgs, 0))

    def _background(self, key, n, size, pool=None):
        """(n,size,size,3) f32 backgrounds: random crops of the staged real
        pool when present (4/5 of samples, octave noise otherwise for
        diversity); pure octave noise without a pool."""
        bgs = None if pool is None else pool.get('bg')
        if bgs is None:
            return octave_background(key, n, size)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        bn, res = bgs.shape[0], bgs.shape[1]
        csz = min(size, res)
        bi = jax.random.randint(k1, (n,), 0, bn)
        off = jax.random.randint(k2, (n, 2), 0, res - csz + 1)
        crops = jax.vmap(lambda im, o: jax.lax.dynamic_slice(
            im, (o[0], o[1], 0), (csz, csz, 3)))(bgs[bi], off)
        real = crops.astype(jnp.float32) / 255.0
        if csz != size:
            real = resize_bilinear(real, (size, size))
        noise = octave_background(k3, n, size)
        use_real = (jax.random.uniform(k4, (n, 1, 1, 1)) < 0.8)
        return jnp.where(use_real, real, noise)

    def _randomize_ref_bg(self, key, ref_crops, ref_masks, p=0.5, pool=None):
        """Composite reference crops over backgrounds with prob p
        (the reference composites synthetic-data refs onto COCO backgrounds,
        train_dataset.py:293-349)."""
        rfn, s = ref_crops.shape[0], ref_crops.shape[1]
        k1, k2 = jax.random.split(key)
        bg = self._background(k1, rfn, s, pool)
        on = (jax.random.uniform(k2, (rfn, 1, 1, 1)) < p).astype(jnp.float32)
        m = ref_masks[..., None]
        comp = ref_crops * m + bg * (1 - m)
        return (1 - on) * ref_crops + on * comp

    # -------------------------------------------------------------- detection
    def det_batch(self, key, qn=4, que_size=512):
        """-> {'ref_imgs', 'que_imgs', 'cens', 'scale_diff'} (detector step).

        Query = look-at warp of a random view of a random scene: base scale
        fills the crop like a reference view, then scale aug 2^[-0.5,1.2],
        rotation aug +-22.5deg, random center offset; composited over a
        procedural background with distractor objects pasted under (and
        occasionally partially over) the target
        (train_dataset.py:432-597 semantics, device-side).
        """
        fn = self._jit('det', self._det_batch_impl, static=(2, 3))
        return fn(key, self.pool, qn, que_size)

    def _warp_view_to_canvas(self, img, mask, pose, K, center, diameter,
                             s_aug, r_aug, off, que_size):
        """Look-at warp of one raw view onto a que_size canvas: the object is
        centered at ``off`` with size s_aug x (reference crop size)."""
        cen, _ = project_points(center[None], pose, K)
        dist = jnp.linalg.norm(camera_position(pose) - center)
        _, f_look = let_me_look_at(pose, K, center)
        f_new = self.size * (1 - self.margin) / diameter * dist
        base_scale = f_new / f_look
        H, K_new, pose_new, _ = look_at_crop_transform(
            K, pose, cen[0], r_aug, base_scale * s_aug, que_size, que_size)
        shift = jnp.eye(3).at[:2, 2].set(off - que_size / 2.0)
        H = shift @ H
        K_new = shift @ K_new
        img_w = warp_perspective(img, H, (que_size, que_size))
        mask_w = warp_perspective(mask[..., None], H, (que_size, que_size))
        return img_w, mask_w, K_new, pose_new

    def _det_batch_impl(self, key, pool, qn, que_size):
        keys = jax.random.split(key, 12)
        si = self._rand_scene(keys[0])
        center = pool['center'][si]
        vi = jax.random.randint(keys[1], (qn,), 0, pool['imgs'].shape[1])
        # scale prior 2^[-0.5, 1.2] (reference train_dataset.py:438)
        scale_aug = 2.0 ** jax.random.uniform(keys[2], (qn,), minval=-0.5,
                                              maxval=1.2)
        rot_aug = jnp.deg2rad(jax.random.uniform(keys[3], (qn,), minval=-22.5,
                                                 maxval=22.5))
        # keep the (augmented) object inside the query image
        off_aug = jax.random.uniform(keys[4], (qn, 2), minval=0.2 * que_size,
                                     maxval=0.8 * que_size)

        imgs = self._to_f32(pool['imgs'][si, vi])
        masks = self._to_f32(pool['masks'][si, vi] * 255)

        img_w, mask_w, K_new, pose_new = jax.vmap(
            self._warp_view_to_canvas,
            in_axes=(0, 0, 0, 0, None, None, 0, 0, 0, None))(
            imgs, masks, pool['poses'][si, vi], pool['Ks'][si, vi], center,
            pool['diameter'][si], scale_aug, rot_aug, off_aug, que_size)

        if self.augment:
            bg = self._background(keys[5], qn, que_size, pool)
        else:
            # clean val batches: flat background like the synthetic renders
            bg = jnp.full((qn, que_size, que_size, 3), 90.0 / 255.0)

        if self.distractors:
            # two distractors under the target + one partial occluder over it
            # (reference train_dataset.py:374-408,580-597)
            nd = 3
            dks = jax.random.split(keys[6], 5)
            dsi = jax.random.randint(dks[0], (qn, nd), 0,
                                     pool['imgs'].shape[0])
            dvi = jax.random.randint(dks[1], (qn, nd), 0,
                                     pool['imgs'].shape[1])
            d_scale = 2.0 ** jax.random.uniform(dks[2], (qn, nd), minval=-0.8,
                                                maxval=0.6)
            d_rot = jax.random.uniform(dks[3], (qn, nd), minval=-jnp.pi,
                                       maxval=jnp.pi)
            d_off = jax.random.uniform(dks[4], (qn, nd, 2),
                                       minval=0.05 * que_size,
                                       maxval=0.95 * que_size)
            d_imgs = self._to_f32(pool['imgs'][dsi, dvi])
            d_masks = self._to_f32(pool['masks'][dsi, dvi] * 255)

            def warp_d(img, mask, pose, K, c, diam, s, r, o):
                return self._warp_view_to_canvas(img, mask, pose, K, c, diam,
                                                 s, r, o, que_size)[:2]

            d_img_w, d_mask_w = jax.vmap(jax.vmap(
                warp_d, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0)))(
                d_imgs, d_masks, pool['poses'][dsi, dvi], pool['Ks'][dsi, dvi],
                pool['center'][dsi], pool['diameter'][dsi], d_scale, d_rot,
                d_off)

            # under-distractors (0,1): painter-composite onto the background
            for di in range(nd - 1):
                m = d_mask_w[:, di]
                bg = d_img_w[:, di] * m + bg * (1 - m)
            # over-distractor (2): mask zeroed near the GT center so the
            # object stays detectable (partial occlusion)
            yy, xx = jnp.meshgrid(jnp.arange(que_size, dtype=jnp.float32),
                                  jnp.arange(que_size, dtype=jnp.float32),
                                  indexing='ij')
            grid = jnp.stack([xx, yy], -1)  # (h,w,2) as (x,y)
            dist_cen = jnp.linalg.norm(grid[None] - off_aug[:, None, None, :],
                                       axis=-1)
            # protect a disk around the GT center (the occluder may clip the
            # object's edges but never hide its center)
            protect = (dist_cen > 0.12 * que_size * scale_aug[:, None, None])
            m_top = d_mask_w[:, nd - 1] * protect[..., None]
        else:
            m_top = None

        que_imgs = img_w * mask_w + bg * (1 - mask_w)
        if m_top is not None:
            que_imgs = d_img_w[:, -1] * m_top + que_imgs * (1 - m_top)
        if self.augment:
            que_imgs = photometric_aug(keys[7], que_imgs)

        ref_imgs = pool['ref_crops'][si]
        if self.augment:
            ref_imgs = self._randomize_ref_bg(keys[8], ref_imgs,
                                              pool['ref_crop_masks'][si],
                                              pool=pool)

        # GT scale: camera similarity from the normalized ref convention to the
        # augmented query (que_ref_scale_rotation_from_poses semantics)
        ref_poses_new = pool['ref_poses_new'][si]
        ref_Ks_new = pool['ref_Ks_new'][si]
        corr = view_correlation(pose_new, ref_poses_new, center)
        gt_ref = jnp.argmax(corr, 1)
        scale_diff, _ = scale_rotation_difference_from_cameras(
            ref_poses_new[gt_ref], pose_new, ref_Ks_new[gt_ref],
            K_new, center)
        return {'ref_imgs': ref_imgs, 'que_imgs': que_imgs,
                'cens': off_aug, 'scale_diff': scale_diff}

    # -------------------------------------------------------------- selection
    def sel_batch(self, key, qn=4):
        """-> selector train-step batch. Query crops around the object with
        scale 2^[-0.3,0.3] and in-plane rotation +-90deg augmentation over
        procedural backgrounds; GT view scores = view correlations, GT angle
        from the camera similarity (train_dataset.py:810-1061 semantics)."""
        fn = self._jit('sel', self._sel_batch_impl, static=(2,))
        return fn(key, self.pool, qn)

    def _sel_batch_impl(self, key, pool, qn):
        keys = jax.random.split(key, 8)
        si = self._rand_scene(keys[0])
        center = pool['center'][si]
        vert = pool['vert'][si]
        diameter = pool['diameter'][si]
        vi = jax.random.randint(keys[1], (qn,), 0, pool['imgs'].shape[1])
        scale_aug = 2.0 ** jax.random.uniform(keys[2], (qn,), minval=-0.3,
                                              maxval=0.3)
        rot_aug = jax.random.uniform(keys[3], (qn,), minval=-jnp.pi / 2,
                                     maxval=jnp.pi / 2)

        def build_one(img, mask, pose, K, s_aug, r_aug):
            cen, _ = project_points(center[None], pose, K)
            dist = jnp.linalg.norm(camera_position(pose) - center)
            _, f_look = let_me_look_at(pose, K, center)
            f_new = self.size * (1 - self.margin) / diameter * dist
            base_scale = f_new / f_look
            H, K_new, pose_new, _ = look_at_crop_transform(
                K, pose, cen[0], r_aug, base_scale * s_aug, self.size,
                self.size)
            img_w = warp_perspective(img, H, (self.size, self.size))
            mask_w = warp_perspective(mask[..., None], H,
                                      (self.size, self.size))
            return img_w, mask_w, K_new, pose_new

        imgs = self._to_f32(pool['imgs'][si, vi])
        masks = self._to_f32(pool['masks'][si, vi] * 255)
        que_imgs, que_masks, que_Ks, que_poses = jax.vmap(build_one)(
            imgs, masks, pool['poses'][si, vi], pool['Ks'][si, vi], scale_aug,
            rot_aug)

        if self.augment:
            bg = self._background(keys[4], qn, self.size, pool)
            que_imgs = que_imgs * que_masks + bg * (1 - que_masks)
            que_imgs = photometric_aug(keys[5], que_imgs)

        # rotated reference copies (an=5) — the selector's ref bank
        angles = jnp.asarray([-jnp.pi / 2, -jnp.pi / 4, 0.0, jnp.pi / 4,
                              jnp.pi / 2])
        ridx = pool['ref_idx'][si]
        ref_raw = self._to_f32(pool['imgs'][si, ridx])

        def rot_refs(angle):
            imgs, _, _, _, _ = normalize_reference_views_device(
                ref_raw, None, pool['poses'][si, ridx], pool['Ks'][si, ridx],
                center, diameter, self.size, self.margin, object_vert=vert,
                extra_angle=angle)
            return imgs

        ref_imgs = jax.vmap(rot_refs)(angles)  # an,rfn,h,w,3

        ref_poses_new = pool['ref_poses_new'][si]
        ref_Ks_new = pool['ref_Ks_new'][si]
        scores = view_correlation(que_poses, ref_poses_new, center)
        gt_ref_ids = jnp.argmax(scores, 1)
        _, angles_r2q = scale_rotation_difference_from_cameras(
            ref_poses_new[gt_ref_ids], que_poses, ref_Ks_new[gt_ref_ids],
            que_Ks, center)
        return {'ref_imgs': ref_imgs, 'ref_poses': ref_poses_new,
                'object_center': center, 'object_vert': vert,
                'que_imgs': que_imgs, 'ref_vp_scores': scores,
                'angles_r2q': angles_r2q, 'gt_ref_ids': gt_ref_ids}

    # ------------------------------------------------------------- refinement
    def ref_batch(self, key, qn=2, ref_num=6):
        """-> refiner train-step batch (train_dataset.py:1243-1396 semantics,
        device-side): input pose = nearby view (top-8 by correlation), query
        warped to look at the input pose with scale 2^[-s,s] / rot +-r deg /
        offset N(0,o) noise (``ref_scale_noise``/``ref_rot_noise``/
        ``ref_off_std``); GT = approximate_rigid_to_similarity."""
        fn = self._jit('ref', self._ref_batch_impl, static=(2, 3))
        return fn(key, self.pool, qn, ref_num)

    def _ref_batch_impl(self, key, pool, qn, ref_num):
        size = self.size
        margin = self.margin
        # normalized-object units (diameter 2, center 0) throughout
        diameter = 2.0
        center = jnp.zeros(3)
        keys = jax.random.split(key, 11)
        si = self._rand_scene(keys[0])
        vi = jax.random.randint(keys[1], (qn,), 0, pool['imgs'].shape[1])
        # near-GT input-pose mode (see __init__ ref_gt_init_frac): orbit the
        # GT pose about the object center by U(0, ref_vp_noise) deg
        use_gt = jnp.logical_and(
            jax.random.bernoulli(keys[8], self.ref_gt_init_frac, (qn,)),
            self.ref_gt_init_frac > 0)
        vp = jnp.deg2rad(self.ref_vp_noise) * jax.random.uniform(keys[9], (qn,))
        axis = jax.random.normal(keys[10], (qn, 3))
        axis = axis / (jnp.linalg.norm(axis, axis=1, keepdims=True) + 1e-8)
        dquat = jnp.concatenate([jnp.cos(vp / 2)[:, None],
                                 jnp.sin(vp / 2)[:, None] * axis], 1)
        dRs = jax.vmap(quat_to_mat)(dquat)
        sn, rn = self.ref_scale_noise, self.ref_rot_noise
        # noise-scale mixture: with prob ref_narrow_frac draw from a 0.3x
        # narrower basin, so one parameter set serves both the first
        # (coarse-error) and the later (polish) refinement iterations —
        # uniform wide noise alone leaves a noisy iteration fixed point
        nf = jax.random.bernoulli(keys[7], self.ref_narrow_frac, (qn,))
        mult = jnp.where(nf, 0.3, 1.0)
        scale_aug = 2.0 ** (mult * jax.random.uniform(keys[2], (qn,),
                                                      minval=-sn, maxval=sn))
        rot_aug = jnp.deg2rad(mult * jax.random.uniform(keys[3], (qn,),
                                                        minval=-rn, maxval=rn))
        off_aug = (mult[:, None] * self.ref_off_std *
                   jax.random.normal(keys[4], (qn, 2)))
        pick = jax.random.randint(keys[5], (qn,), 0, 8)

        poses_norm = pool['poses_norm'][si]
        Ks_all = pool['Ks'][si]
        imgs_all_u8 = pool['imgs'][si]

        def build_one(qi, s_aug, r_aug, off, pk, gt_i, dR_i):
            que_pose = poses_norm[qi]
            que_K = Ks_all[qi]
            que_img = self._to_f32(imgs_all_u8[qi])
            # input pose: one of the top-8 correlated views, or (gt_i) the GT
            # pose orbited about the object center — X_cam = R(dR X) + t
            # keeps the camera distance and yields a U(0,vp)-deg viewpoint gap
            corr = view_correlation(que_pose[None], poses_norm, center)[0]
            _, top = jax.lax.top_k(corr, 8)
            ii = top[pk]
            pose_orbit = jnp.concatenate(
                [que_pose[:, :3] @ dR_i, que_pose[:, 3:]], 1)
            input_pose_raw = jnp.where(gt_i, pose_orbit, poses_norm[ii])
            input_K_raw = jnp.where(gt_i, que_K, Ks_all[ii])

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
            corr_r = view_correlation(input_pose[None], poses_norm, center)[0]
            _, ridx = jax.lax.top_k(corr_r, ref_num)
            ref_crops, _, ref_Ks_new, ref_poses_new, _ = \
                normalize_reference_views_device(
                    self._to_f32(imgs_all_u8[ridx]), None, poses_norm[ridx],
                    Ks_all[ridx], center, diameter, size, margin,
                    input_pose=input_pose, input_K=input_K)
            return (que_img_warp, que_K_warp, input_pose, pose_sim,
                    que_pose_warp, ref_crops, ref_poses_new, ref_Ks_new)

        (que_imgs, que_Ks_in, poses_in, poses_sim, poses_warp, ref_imgs,
         ref_poses, ref_Ks) = jax.vmap(build_one)(vi, scale_aug, rot_aug,
                                                  off_aug, pick, use_gt, dRs)
        if self.augment:
            que_imgs = photometric_aug(keys[6], que_imgs, p_blur=0.15,
                                       p_motion=0.1, p_jitter=0.5,
                                       p_shade=0.2, p_noise=0.3)
        return {'que_imgs': que_imgs, 'que_Ks_in': que_Ks_in,
                'que_poses_in': poses_in, 'ref_imgs': ref_imgs,
                'ref_poses': ref_poses, 'ref_Ks': ref_Ks,
                'object_center': jnp.zeros((qn, 3)),
                'poses_sim_in_to_que': poses_sim,
                'que_poses_warp': poses_warp}


class RefinerValData:
    """Refiner validation on CACHED detector/selector predictions (reference
    RefinerValDataset, train_dataset.py:1475-1581): the input poses are the
    pipeline's actual pose initializations — produced by
    ``cli/prepare.py gen_val_set`` (prepare.py:44-71) — so the refiner is
    validated on the initialization distribution it sees at inference, not on
    synthetic GT-noise.
    """

    def __init__(self, que_database_name, ref_split='synthetic_split',
                 val_root='data/val', size=128, margin=0.05, ref_num=6,
                 ref_even_num=64):
        import pickle
        from gen6d_tpu.geometry.solvers import (
            estimate_pose_from_similarity_transform_compose)
        from gen6d_tpu.geometry.pose import normalize_pose

        self.size = size
        self.margin = margin
        self.ref_num = ref_num
        with open(f'{val_root}/det/{que_database_name}/det.pkl', 'rb') as f:
            det_info = pickle.load(f)
        with open(f'{val_root}/sel/{que_database_name}/det-sel.pkl', 'rb') as f:
            sel_info = pickle.load(f)

        db = dbm.parse_database_name(que_database_name)
        self.database = db
        center = np.asarray(dbm.get_object_center(db), np.float32)
        diameter = float(dbm.get_diameter(db))
        self.center = center
        self.diameter = diameter
        norm_scale = 2.0 / diameter
        norm_offset = (-norm_scale * center).astype(np.float32)

        que_ids = sorted(det_info.keys(), key=str)
        self.que_ids = que_ids
        imgs, _, poses_gt, Ks = rp.gather_images(db, que_ids, with_masks=False)
        self.que_imgs_u8 = jnp.asarray((imgs * 255).astype(np.uint8))
        self.que_Ks = jnp.asarray(Ks)
        # GT + pose-init in normalized units (refiner.py:289-290)
        poses_gt_n = jax.vmap(normalize_pose, in_axes=(0, None, None))(
            jnp.asarray(poses_gt), norm_scale, jnp.asarray(norm_offset))
        self.que_poses_gt = poses_gt_n

        positions = jnp.asarray(np.stack([det_info[i][0] for i in que_ids]))
        scales = jnp.asarray([float(det_info[i][1]) for i in que_ids])
        angles = jnp.asarray([float(sel_info[i][0]) for i in que_ids])
        sel_poses = jnp.asarray(np.stack([sel_info[i][1] for i in que_ids]))
        sel_Ks = jnp.asarray(np.stack([sel_info[i][2] for i in que_ids]))
        pose0 = jax.vmap(estimate_pose_from_similarity_transform_compose,
                         in_axes=(0, 0, 0, 0, 0, 0, None))(
            positions, scales, angles, sel_poses, sel_Ks, self.que_Ks,
            jnp.asarray(center))
        self.poses_init = jax.vmap(normalize_pose, in_axes=(0, None, None))(
            pose0, norm_scale, jnp.asarray(norm_offset))

        # reference-view pool for refinement (even FPS, like the estimator)
        ref_ids_all, _ = dbm.get_database_split(db, ref_split)
        ref_ids = rp.select_reference_img_ids_fps(
            db, ref_ids_all, min(ref_even_num, len(ref_ids_all) - 1))
        rimgs, _, rposes, rKs = rp.gather_images(db, ref_ids, with_masks=False)
        self.ref_imgs_u8 = jnp.asarray((rimgs * 255).astype(np.uint8))
        self.ref_poses = jax.vmap(normalize_pose, in_axes=(0, None, None))(
            jnp.asarray(rposes), norm_scale, jnp.asarray(norm_offset))
        self.ref_Ks = jnp.asarray(rKs)
        self._jit = None

    def __len__(self):
        return len(self.que_ids)

    def batch(self, indices):
        """indices: (qn,) numpy ints -> refiner batch dict (same keys as
        SyntheticTrainData.ref_batch, with the cached initializations)."""
        if self._jit is None:
            self._jit = jax.jit(self._batch_impl)
        return self._jit(jnp.asarray(indices))

    def _batch_impl(self, idx):
        size = self.size
        margin = self.margin
        center = jnp.zeros(3)

        def build_one(qi):
            que_img = self.que_imgs_u8[qi].astype(jnp.float32) / 255.0
            que_K = self.que_Ks[qi]
            in_pose = self.poses_init[qi]
            que_pose_gt = self.que_poses_gt[qi]
            # rectify the input pose to a canonical look-at crop
            # (refiner.py:294-301 / estimator._refine_prewarp)
            _, new_f = let_me_look_at(in_pose, que_K, center)
            in_dist = jnp.linalg.norm(camera_position(in_pose) - center)
            in_f = size * (1 - margin) / 2.0 * in_dist
            scale = in_f / new_f
            position, _ = project_points(center[None], in_pose, que_K)
            H, que_K_warp, in_pose_warp, pose_rect = look_at_crop_transform(
                que_K, in_pose, position[0], 0.0, scale, size, size)
            que_warp = warp_perspective(que_img, H, (size, size))
            que_pose_warp_gt = pose_compose(que_pose_gt, pose_rect)
            pose_sim = approximate_rigid_to_similarity(
                in_pose_warp, que_pose_warp_gt, que_K_warp, que_K_warp, center)

            corr = view_correlation(in_pose_warp[None], self.ref_poses,
                                    center)[0]
            _, ridx = jax.lax.top_k(corr, self.ref_num)
            ref_crops, _, ref_Ks_new, ref_poses_new, _ = \
                normalize_reference_views_device(
                    self.ref_imgs_u8[ridx].astype(jnp.float32) / 255.0, None,
                    self.ref_poses[ridx], self.ref_Ks[ridx], center, 2.0,
                    size, margin, input_pose=in_pose_warp, input_K=que_K_warp)
            return (que_warp, que_K_warp, in_pose_warp, pose_sim,
                    que_pose_warp_gt, ref_crops, ref_poses_new, ref_Ks_new)

        (que_imgs, que_Ks_in, poses_in, poses_sim, poses_warp, ref_imgs,
         ref_poses, ref_Ks) = jax.vmap(build_one)(idx)
        return {'que_imgs': que_imgs, 'que_Ks_in': que_Ks_in,
                'que_poses_in': poses_in, 'ref_imgs': ref_imgs,
                'ref_poses': ref_poses, 'ref_Ks': ref_Ks,
                'object_center': jnp.zeros((idx.shape[0], 3)),
                'poses_sim_in_to_que': poses_sim,
                'que_poses_warp': poses_warp}
