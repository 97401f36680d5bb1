"""Gen6DEstimator: the detect -> crop -> select -> solve -> refine pipeline.

Preserves the reference API (estimator.py:94-216): ``build(database,
split_type)`` then ``predict(que_img, que_K, pose_init=None) -> (pose,
inter_results)`` — but every stage is a jitted XLA program and the data stays
on device between stages:

- build: FPS view selection (host) + one jitted program for reference
  normalization, in-plane rotated copies, and backbone feature caching
  (replaces the per-view cv2.warpPerspective loops, estimator.py:150-164);
- predict: jitted detect / crop+select / pose-init stages; the refinement loop
  re-selects & re-warps reference views ON DEVICE from a pre-staged image stack
  (the reference re-reads and re-warps from disk every iteration,
  refiner.py:300-313).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from gen6d_tpu.data import database as dbm
from gen6d_tpu.data import ref_prep as rp
from gen6d_tpu.geometry import transform2d as t2d
from gen6d_tpu.geometry.camera import (let_me_look_at, project_points,
                                       view_correlation)
from gen6d_tpu.geometry.fps import sample_fps_points
from gen6d_tpu.geometry.pose import (camera_position, normalize_pose,
                                     denormalize_pose, pose_compose,
                                     pose_inverse)
from gen6d_tpu.geometry.solvers import (
    compose_sim_pose, estimate_pose_from_similarity_transform_compose,
    pnp_gauss_newton, pose_sim_to_pose_rigid)
from gen6d_tpu.models.detector import Detector, parse_detection
from gen6d_tpu.models.refiner import VolumeRefiner
from gen6d_tpu.models.selector import ViewpointSelector
from gen6d_tpu.ops.warp import warp_affine, warp_perspective
from gen6d_tpu.data.ref_prep import (look_at_crop_transform,
                                     normalize_reference_views_device)

SELECTOR_ANGLES = (-np.pi / 2, -np.pi / 4, 0.0, np.pi / 4, np.pi / 2)  # estimator.py:152


class Gen6DEstimator:
    default_cfg = {
        'ref_resolution': 128,
        'ref_view_num': 64,
        'det_ref_view_num': 32,
        'refine_iter': 3,
        'refine_ref_num': 6,
        'refine_even_num': 128,
        'refine_size': 128,
        'refine_margin': 0.05,
        # >0: pre-warp the refine candidate views ONCE at build into
        # vert-rectified canonical crops of this size (stored with their exact
        # crop cameras — a look-at crop is a rotation homography, so the
        # canonical crop IS a valid posed image of the object). The
        # per-iteration prewarp then warps from the canonical crops instead of
        # the full-resolution frames, cutting the refine stage's dominant
        # warp-gather HBM traffic ~5x (docs/profile.md: 4x34 ms/batch reading
        # (qn,6,480,640,3)). 256 with margin 0.4 keeps the object at ~154 px
        # (above the 121 px it fills in the final 128 crop: no detail loss)
        # and covers the final crop's corners under any in-plane rotation.
        'refine_canon_size': 0,
        'refine_canon_margin': 0.4,
        # log2-scale calibration of the detector decode (see _decode_det)
        'det_scale_correction': 0.0,
        # log2-scale calibration of the refiner's similarity update: the
        # from-scratch refiner's scale head carries a conditional bias at
        # near-identity inputs (measured ~-0.075 via scripts/
        # calibrate_refine_scale.py on TRAIN objects), which compounds across
        # refine iterations into a divergent depth drift
        'refine_scale_correction': 0.0,
        # w-first quaternion undoing the refiner rotation head's systematic
        # near-identity bias (same calibration script); None = identity
        'refine_rot_correction': None,
        # per-stage overrides for the polish cascade's tail net: the coarse
        # corrections above calibrate the WIDE-noise refiner and must not
        # leak onto the tight-noise polish net (and vice versa). None =
        # fall back to 0 / identity for the polish stage.
        'polish_scale_correction': 0.0,
        'polish_rot_correction': None,
        # >0: run the LAST N refine iterations with the ``refiner_polish``
        # network (a precision fine-tune of the same architecture): the
        # coarse refiner is trained on wide init noise (first-iteration
        # coverage of real det/sel errors) and carries a noisy fixed point
        # (docs/refiner_head_jitter.md: ~5 deg rotation-head error at a GT
        # init); the polish net is trained on tight noise only. No reference
        # analogue (the reference's pretrained refiner needs no cascade).
        'refine_polish_iter': 0,
        # >1: average the last N POLISH iterates (see refine_avg below for the
        # mechanism). The polish net's per-step error is mostly conditional on
        # the query (docs/refiner_head_jitter.md: 2.9 deg mean bias vs 0.7 deg
        # across-query std), so iterating it compounds a drift — the cascade
        # therefore averages the COARSE trajectory first (refine_avg), applies
        # the polish steps from that averaged pose, and only averages polish
        # iterates if this is >1. 0/1 = take the last polish output.
        'polish_avg': 0,
        # >1: average the last N refine iterates. At the refine fixed point
        # the per-iteration pose estimates jitter around the target (each
        # iteration crops slightly differently -> independent network noise;
        # docs/stage_diagnosis.md: ~6 px drift even from GT init), so
        # averaging reduces the variance ~sqrt(N). Implemented as the
        # reference's own smoothing trick (predict.py:18-26,69) applied
        # across refine iterates instead of video frames: project a 3D box
        # around the object with each iterate's pose, average the 2D
        # points, re-solve with PnP. Runs inside the fused program.
        'refine_avg': 0,
        # pad queries bottom-right with zeros up to the next multiple of this
        # bucket before the jitted programs see them: arbitrary resolutions
        # work, and coarser buckets (e.g. 128) merge nearby sizes into one
        # compiled program (SURVEY §7 hard part 2 — the reference only
        # requires %32 via its per-scale round_up, detector.py:236-239;
        # zero-pad is exact for this pipeline: K keeps its principal point
        # and out-of-image warp taps already read zero)
        'query_bucket': 32,
        # 'gather': XLA 4-tap gather warps (reference bilinear semantics,
        # works everywhere); 'pallas': the windowed hat-matmul MXU kernel
        # (ops/warp_pallas.py) for the refine prewarp + select crop — the
        # gather lowering is the dominant device cost of the refine loop
        # (docs/profile.md). Bands bound each warp's per-tile source
        # footprint; see warp_pallas.warp_perspective_batch.
        'warp_method': 'gather',
        'warp_band_que': 192,
        'warp_band_ref': 96,
    }

    def __init__(self, cfg=None, detector=None, selector=None, refiner=None,
                 refiner_polish=None):
        """detector/selector/refiner: (flax module, params) tuples; refiner may
        be None (detection+selection only, as when cfg['refiner'] is None in
        the reference, estimator.py:112-115). refiner_polish: optional second
        refiner (same architecture) run for the last cfg['refine_polish_iter']
        iterations (see default_cfg)."""
        self.cfg = {**self.default_cfg, **(cfg or {})}
        self.detector, self.detector_params = detector
        self.selector, self.selector_params = selector
        if refiner is not None:
            self.refiner, self.refiner_params = refiner
        else:
            self.refiner = self.refiner_params = None
        if refiner_polish is not None:
            self.refiner_polish, self.refiner_polish_params = refiner_polish
        else:
            self.refiner_polish = self.refiner_polish_params = None
        self.ref_info = {}
        self._jit_cache = {}

    # ------------------------------------------------------------------ build
    def build(self, database: dbm.BaseDatabase, split_type: str):
        """Prepare reference data on device (estimator.py:139-171)."""
        import os, time
        _timing = bool(os.environ.get('GEN6D_TIMING'))
        _t = [time.time()]

        def tic(stage):
            if _timing:
                now = time.time()
                print(f'[build] {stage}: {now - _t[0]:.2f}s', flush=True)
                _t[0] = now

        cfg = self.cfg
        object_center = np.asarray(dbm.get_object_center(database), np.float32)
        object_vert = np.asarray(dbm.get_object_vert(database), np.float32)
        diameter = float(dbm.get_diameter(database))
        ref_ids_all, _ = dbm.get_database_split(database, split_type)

        ref_ids = rp.select_reference_img_ids_fps(database, ref_ids_all,
                                                 cfg['ref_view_num'])
        # uint8 end-to-end to the device: 4x less over the tunneled
        # host->device link and no 472MB f32 detour on the 1-core host
        raw_imgs, raw_masks, raw_poses, raw_Ks = rp.gather_images(
            database, ref_ids, as_uint8=True)
        tic('host prep (split/FPS/gather refs)')

        size = cfg['ref_resolution']

        def _build_refs_fn():
            @jax.jit
            def build_refs(imgs_u8, masks, poses, Ks, center, diam, vert):
                imgs = imgs_u8.astype(jnp.float32) / 255.0
                # normalized (vert-rectified) crops for the detector + ref_info
                crops, crop_masks, K_new, pose_new, Hs = \
                    normalize_reference_views_device(
                        imgs, masks, poses, Ks, center, diam, size, 0.05,
                        object_vert=vert)
                # in-plane rotated copies for the selector
                # (estimator.py:150-164): H_rot(angle) = center-rotation
                # affine composed onto each crop H
                def rot_H(angle):
                    M = t2d.offset_2d(-size / 2.0, -size / 2.0)
                    M = t2d.compose_2d(M, t2d.rotation_2d(angle))
                    M = t2d.compose_2d(M, t2d.offset_2d(size / 2.0, size / 2.0))
                    return jnp.concatenate([M, jnp.asarray([[0.0, 0.0, 1.0]])], 0)

                rots = []
                for angle in SELECTOR_ANGLES:
                    Hr = rot_H(angle)
                    warped = jax.vmap(
                        lambda im, h: warp_perspective(im, Hr @ h, (size, size))
                    )(imgs, Hs)
                    rots.append(warped)
                ref_imgs_rots = jnp.stack(rots, 0)  # an,rfn,size,size,3
                return crops, crop_masks, K_new, pose_new, Hs, ref_imgs_rots
            return build_refs

        # _get: onboarding a second object reuses the compiled programs
        # (shape-keyed; object geometry is passed as arguments)
        crops, crop_masks, K_new, pose_new, Hs, ref_imgs_rots = \
            jax.block_until_ready(self._get('build_refs', _build_refs_fn)(
                jnp.asarray(raw_imgs), jnp.asarray(raw_masks, jnp.float32),
                jnp.asarray(raw_poses), jnp.asarray(raw_Ks),
                jnp.asarray(object_center), diameter,
                jnp.asarray(object_vert)))
        tic('build_refs (warp+rot copies)')

        # detector / selector feature caches (one jitted call each)
        det_ref_feats = jax.jit(
            lambda p, x: self.detector.apply(p, x, method='load_ref'))(
                self.detector_params, crops[:cfg['det_ref_view_num']])
        if _timing:
            jax.block_until_ready(det_ref_feats)
        tic('detector ref feats')
        sel_cache = jax.jit(
            lambda p, a, b, c, d: self.selector.apply(p, a, b, c, d,
                                                      method='load_ref'))(
            self.selector_params, ref_imgs_rots, pose_new,
            jnp.asarray(object_center), jnp.asarray(object_vert))
        jax.block_until_ready(sel_cache)
        tic('selector ref feats')

        self.ref_info = {
            'imgs': crops, 'ref_imgs': ref_imgs_rots, 'masks': crop_masks,
            'Ks': K_new, 'poses': pose_new, 'center': jnp.asarray(object_center),
            'det_ref_feats': det_ref_feats,
            'sel_feats': sel_cache[0], 'sel_pose_embed': sel_cache[1],
        }

        # refiner staging: even-FPS subset of ALL reference views, raw images
        # on device, poses pre-normalized to the unit-sphere object frame
        # (refiner.py:275-313 semantics without the per-iteration disk reads)
        if self.refiner is not None:
            norm_scale = 2.0 / diameter
            norm_offset = (-norm_scale * object_center).astype(np.float32)
            all_poses = np.stack([database.get_pose(i) for i in ref_ids_all], 0)
            cams = -np.einsum('nji,nj->ni', all_poses[:, :, :3], all_poses[:, :, 3])
            n_even = min(self.cfg['refine_even_num'], len(ref_ids_all))
            idx = sample_fps_points(cams, n_even + 1, True, index_model=True)
            even_ids = np.asarray(ref_ids_all)[idx]
            imgs_e, _, poses_e, Ks_e = rp.gather_images(database, even_ids,
                                                        with_masks=False,
                                                        as_uint8=True)
            tic('refine gather (host)')
            # jitted (an eager vmap here cost 230s of per-op axon compiles);
            # result STAYS ON DEVICE: the first D2H readback inside build hit
            # a 14-180s axon relay stall (timeline: compile done in 0.45s,
            # then a dead gap blocked in array._value) — and nothing here
            # needs host values
            norm_poses = self._get('norm_poses', lambda: jax.jit(
                jax.vmap(normalize_pose, in_axes=(0, None, None))))
            poses_e = norm_poses(jnp.asarray(poses_e), norm_scale,
                                 jnp.asarray(norm_offset))
            if _timing:
                jax.block_until_ready(poses_e)
                tic('refine norm poses')
            # stored uint8: the refine prewarp gathers (qn, ref_num) views per
            # iteration — u8 cuts that HBM stream 4x vs f32 (the dominant cost
            # of the refine stage per the round-2 trace, docs/profile.md);
            # converted to f32 after the view gather.
            imgs_dev = jnp.asarray(imgs_e)  # u8 upload, once
            if _timing:
                jax.block_until_ready(imgs_dev)
                tic('refine u8 upload')
            canon = int(cfg.get('refine_canon_size') or 0)
            if canon:
                margin_c = float(cfg['refine_canon_margin'])

                def _build_canon_fn():
                    @jax.jit
                    def build_canon(imgs_u8, poses, Ks, vert):
                        imgs = imgs_u8.astype(jnp.float32) / 255.0
                        crops, _, K_new, pose_new, _ = \
                            normalize_reference_views_device(
                                imgs, None, poses, Ks, jnp.zeros(3), 2.0,
                                canon, margin_c, object_vert=vert)
                        crops_u8 = jnp.clip(jnp.round(crops * 255.0), 0,
                                            255).astype(jnp.uint8)
                        return crops_u8, K_new, pose_new
                    return build_canon

                imgs_dev, Ks_c, poses_c = self._get(
                    'build_canon', _build_canon_fn)(
                    imgs_dev, jnp.asarray(poses_e), jnp.asarray(Ks_e),
                    jnp.asarray(object_vert))
                if _timing:
                    jax.block_until_ready(imgs_dev)
                    tic('refine build_canon')
                poses_e = poses_c  # device arrays; no D2H round trip
                Ks_e = Ks_c
            self.ref_info.update({
                'refine_imgs': imgs_dev,
                'refine_poses': jnp.asarray(poses_e),
                'refine_Ks': jnp.asarray(Ks_e),
                'norm_scale': norm_scale,
                'norm_offset': jnp.asarray(norm_offset),
            })
            tic('refine staging (canon/upload)')

    # ---------------------------------------------------------------- stages
    def _decode_det(self, out):
        """parse_detection + optional scale calibration:
        ``cfg['det_scale_correction']`` (log2 units) compensates a measured
        systematic bias of the detector scale head on the serving path (fit on
        TRAINING objects by scripts/calibrate_det_scale.py; no analogue in the
        reference, whose pretrained detector is unbiased)."""
        pos, scale = parse_detection(out['scores'], out['select_pr_scale'],
                                     out['select_pr_offset'])
        corr = float(self.cfg.get('det_scale_correction', 0.0))
        if corr:
            scale = scale * (2.0 ** corr)
        return pos, scale

    def _detect_fn(self):
        det = self.detector

        @jax.jit
        def run(params, que_imgs, ref_feats):
            out = det.apply(params, que_imgs, ref_feats, method='detect')
            return self._decode_det(out)
        return run

    def _select_fn(self):
        sel = self.selector
        size = self.cfg['ref_resolution']

        @jax.jit
        def run(params, que_img, que_K_dummy, position, scale_r2q, sel_feats,
                sel_embed):
            # crop the query around the detection (estimator.py:184): device
            # warp_affine replaces cv2 transformation_crop
            M = t2d.crop_transform_2d(position, 1.0 / scale_r2q, 0.0, size)
            crop = warp_affine(que_img, M, (size, size))
            logits, angles = sel.apply(params, crop[None], sel_feats, sel_embed,
                                       method='select')
            ref_idx = jnp.argmax(logits, 1)[0]
            angle = angles[0, ref_idx]
            return crop, ref_idx, angle, logits[0]
        return run

    def _pose_init_fn(self):
        @jax.jit
        def run(position, scale_r2q, angle_r2q, ref_poses, ref_Ks, que_K,
                center, ref_idx):
            ref_pose = ref_poses[ref_idx]
            ref_K = ref_Ks[ref_idx]
            return estimate_pose_from_similarity_transform_compose(
                position, scale_r2q, angle_r2q, ref_pose, ref_K, que_K, center)
        return run

    def _batch_warp(self, imgs, Hs, size, band):
        """Batched homography warp, method-dispatched: 'pallas' runs the
        windowed hat-matmul kernel (ops/warp_pallas.py); 'gather' the XLA
        4-tap gather warp. Identical bilinear/zero-fill semantics."""
        if self.cfg.get('warp_method') == 'pallas':
            from gen6d_tpu.ops.warp_pallas import warp_perspective_batch
            return warp_perspective_batch(imgs, Hs, (size, size), band=band)
        # barrier: keep the per-view transform chain out of the warp's
        # per-pixel fused index computation (2.5x end-to-end otherwise)
        Hs = jax.lax.optimization_barrier(Hs)
        return jax.vmap(lambda im, h: warp_perspective(im, h, (size, size)))(
            imgs, Hs)

    def _refine_pregeom(self, que_K, pose_in_raw, ref_poses, ref_Ks,
                        norm_scale, norm_offset):
        """Single-query device geometry before the refiner network
        (refiner.py:275-313), pixels untouched: normalize pose, look-at crop
        transform for the query, top-k reference selection + their crop
        transforms. vmapped by ``_refine_iter_batch``; the actual warps run
        batched at the caller."""
        size = self.cfg['refine_size']
        margin = self.cfg['refine_margin']
        ref_num = self.cfg['refine_ref_num']
        center = jnp.zeros(3)
        diameter = 2.0
        in_pose = normalize_pose(pose_in_raw, norm_scale, norm_offset)

        _, new_f = let_me_look_at(in_pose, que_K, center)
        in_dist = jnp.linalg.norm(camera_position(in_pose) - center)
        in_f = size * (1 - margin) / diameter * in_dist
        scale = in_f / new_f
        position, _ = project_points(center[None], in_pose, que_K)
        H_que, que_K_warp, in_pose_warp, que_pose_rect = look_at_crop_transform(
            que_K, in_pose, position[0], 0.0, scale, size, size)

        # select ref_num nearest reference views by view correlation
        # (select_reference_img_ids_refinement, database_utils.py:125-139)
        corr = view_correlation(in_pose_warp[None], ref_poses, center)[0]
        _, top_idx = jax.lax.top_k(corr, ref_num)
        sel_poses = ref_poses[top_idx]
        sel_Ks = ref_Ks[top_idx]
        Hs_ref, ref_K_new, ref_pose_new, _ = rp.reference_crop_transforms(
            sel_poses, sel_Ks, center, diameter, size, margin,
            input_pose=in_pose_warp, input_K=que_K_warp)
        return (H_que, que_K_warp, in_pose_warp, que_pose_rect, top_idx,
                Hs_ref, ref_K_new, ref_pose_new)

    def _refine_compose(self, quat, scale_pr, offset_pr, in_pose_warp,
                        que_K_warp, que_pose_rect, norm_scale, norm_offset):
        """Single-query composition after the network (refiner.py:334-341)."""
        center = jnp.zeros(3)
        pose_sim = compose_sim_pose(scale_pr, quat, offset_pr, in_pose_warp,
                                    center)
        pose_pr = pose_sim_to_pose_rigid(pose_sim, in_pose_warp, que_K_warp,
                                         que_K_warp, center)
        pose_pr = pose_compose(pose_pr, pose_inverse(que_pose_rect))
        return denormalize_pose(pose_pr, norm_scale, norm_offset)

    def _refine_iter_batch(self, params, que_imgs, que_Ks, poses_in, ref_imgs,
                           ref_poses, ref_Ks, norm_scale, norm_offset,
                           module=None):
        """One batched refinement iteration: vmapped geometry, then batched
        warps (the hot pixel work — one kernel launch per warp site), then one
        batched refiner network call. ``module`` overrides the refiner flax
        module (the polish cascade's second net)."""
        size = self.cfg['refine_size']
        (H_que, que_K_warp, in_pose_warp, que_pose_rect, top_idx, Hs_ref,
         ref_K_new, ref_pose_new) = jax.vmap(
            self._refine_pregeom, in_axes=(0, 0, None, None, None, None)
        )(que_Ks, poses_in, ref_poses, ref_Ks, norm_scale, norm_offset)

        que_warp = self._batch_warp(que_imgs, H_que, size,
                                    self.cfg['warp_band_que'])
        sel_imgs = ref_imgs[top_idx]  # qn, rn, hc, wc, 3
        if sel_imgs.dtype == jnp.uint8:  # u8 storage (see build)
            sel_imgs = sel_imgs.astype(jnp.float32) / 255.0
        qn, rn, hc, wc, ch = sel_imgs.shape
        ref_crops = self._batch_warp(
            sel_imgs.reshape(qn * rn, hc, wc, ch),
            Hs_ref.reshape(qn * rn, 3, 3), size,
            self.cfg['warp_band_ref']).reshape(qn, rn, size, size, ch)
        out = (module or self.refiner).apply(
            params, que_warp, que_K_warp, in_pose_warp, ref_crops,
            ref_pose_new, ref_K_new)
        # stage-specific calibration: the polish net has its own (usually
        # ~zero) corrections; the coarse net's wide-noise corrections must
        # not be applied to it (cfg polish_*_correction)
        is_polish = module is not None and module is self.refiner_polish
        stage = 'polish' if is_polish else 'refine'
        scale_log2 = (out['scale'][:, 0] +
                      float(self.cfg.get(f'{stage}_scale_correction') or 0.0))
        quat = out['rotation']
        rot_corr = self.cfg.get(f'{stage}_rot_correction')
        if rot_corr is not None:
            # left-compose the inverse bias: q_pred ~ q_bias o q_true at
            # identity, so R_eff = R_bias^T @ R_pred
            from gen6d_tpu.geometry.rotations import mat_to_quat, quat_to_mat
            R_corr = quat_to_mat(jnp.asarray(rot_corr, jnp.float32)).T
            quat = mat_to_quat(R_corr[None] @ quat_to_mat(quat))
        return jax.vmap(self._refine_compose, in_axes=(0, 0, 0, 0, 0, 0, None,
                                                       None))(
            quat, 2.0 ** scale_log2, out['offset'],
            in_pose_warp, que_K_warp, que_pose_rect, norm_scale, norm_offset)

    def _avg_refine_traj(self, traj, que_Ks, center, norm_scale):
        """Average the last-k refine iterates into one pose per query:
        project an object-diameter 3D box with every iterate's pose, average
        the 2D projections across iterates, re-solve with PnP initialized at
        the last iterate. traj: (k, qn, 3, 4) -> (qn, 3, 4). This is the
        reference's smoothing trick (predict.py:18-26,69) applied across
        refine iterations instead of video frames; see cfg['refine_avg']."""
        signs = jnp.asarray([[sx, sy, sz] for sx in (-1.0, 1.0)
                             for sy in (-1.0, 1.0) for sz in (-1.0, 1.0)])
        # half-diameter box in the raw world frame (norm_scale = 2/diameter)
        corners = center[None] + (0.5 / norm_scale) * signs  # (8, 3)

        def one(traj_q, K):
            pts = jax.vmap(lambda p: project_points(corners, p, K)[0])(traj_q)
            return pnp_gauss_newton(corners, pts.mean(0), K, traj_q[-1])

        return jax.vmap(one, in_axes=(1, 0))(traj, que_Ks)

    def _avg_refine_fn(self):
        @jax.jit
        def run(traj, que_K, center, norm_scale):
            """Single-query iterate averaging: traj (k,3,4) -> (3,4)."""
            return self._avg_refine_traj(traj[:, None], que_K[None], center,
                                         norm_scale)[0]
        return run

    def _refine_fn(self, module=None):
        @jax.jit
        def run(params, que_img, que_K, pose_in_raw, ref_imgs, ref_poses,
                ref_Ks, norm_scale, norm_offset):
            """One refinement iteration for a single query
            (refiner.py:275-341 semantics)."""
            return self._refine_iter_batch(params, que_img[None], que_K[None],
                                           pose_in_raw[None], ref_imgs,
                                           ref_poses, ref_Ks, norm_scale,
                                           norm_offset, module=module)[0]
        return run

    def _refine_polish_fn(self):
        return self._refine_fn(module=self.refiner_polish)

    def _fused_fn(self):
        """The whole detect -> crop -> select -> solve -> refine xN pipeline as
        ONE jitted program over a query batch — zero host round-trips between
        stages (vs. the reference's 4+ per query, SURVEY.md §3.1)."""
        det = self.detector
        sel = self.selector
        size = self.cfg['ref_resolution']
        refine_iter = self.cfg['refine_iter']
        polish_iter = 0
        if self.refiner_polish_params is not None:
            polish_iter = min(int(self.cfg.get('refine_polish_iter') or 0),
                              refine_iter)
        main_iter = refine_iter - polish_iter
        refine_avg = min(int(self.cfg.get('refine_avg') or 0), main_iter)
        polish_avg = min(int(self.cfg.get('polish_avg') or 0), polish_iter)

        @jax.jit
        def run(det_params, sel_params, ref_params, que_imgs, que_Ks, ref_info,
                polish_params=None):
            qn = que_imgs.shape[0]
            out = det.apply(det_params, que_imgs, ref_info['det_ref_feats'],
                            method='detect')
            positions, scales = self._decode_det(out)

            # crop the queries around the detections (estimator.py:184),
            # batched through the method-dispatched warp (the affine is a
            # homography with zero perspective row)
            Ms = jax.vmap(
                lambda pos, scl: t2d.crop_transform_2d(pos, 1.0 / scl, 0.0,
                                                       size))(positions, scales)
            bottom = jnp.tile(jnp.asarray([[[0.0, 0.0, 1.0]]]), (qn, 1, 1))
            crops = self._batch_warp(que_imgs, jnp.concatenate([Ms, bottom], 1),
                                     size, self.cfg['warp_band_que'])
            logits, angles = sel.apply(sel_params, crops, ref_info['sel_feats'],
                                       ref_info['sel_pose_embed'],
                                       method='select')
            ref_idx = jnp.argmax(logits, 1)
            angle = angles[jnp.arange(qn), ref_idx]

            pose0 = jax.vmap(
                estimate_pose_from_similarity_transform_compose,
                in_axes=(0, 0, 0, 0, 0, 0, None))(
                positions, scales, angle, ref_info['poses'][ref_idx],
                ref_info['Ks'][ref_idx], que_Ks, ref_info['center'])

            if self.refiner is None or refine_iter == 0:
                return pose0

            def step(poses, params, module):
                return self._refine_iter_batch(
                    params, que_imgs, que_Ks, poses,
                    ref_info['refine_imgs'], ref_info['refine_poses'],
                    ref_info['refine_Ks'], ref_info['norm_scale'],
                    ref_info['norm_offset'], module=module)

            # cascade order matters: average the COARSE trajectory into one
            # low-variance pose FIRST, then run the polish steps from it (the
            # polish net's error is query-conditional, so its iterates drift
            # rather than jitter — averaging across the stage boundary dilutes
            # the polish gain; docs/refiner_head_jitter.md)
            poses = pose0
            if main_iter:
                def body(poses, _):
                    poses = step(poses, ref_params, None)
                    return poses, (poses if refine_avg > 1 else None)
                poses, traj = jax.lax.scan(body, poses, None, length=main_iter)
                if refine_avg > 1:
                    poses = self._avg_refine_traj(
                        traj[main_iter - refine_avg:], que_Ks,
                        ref_info['center'], ref_info['norm_scale'])
            if polish_iter:  # the precision cascade's tail iterations
                def body_p(poses, _):
                    poses = step(poses, polish_params, self.refiner_polish)
                    return poses, (poses if polish_avg > 1 else None)
                poses, traj = jax.lax.scan(body_p, poses, None,
                                           length=polish_iter)
                if polish_avg > 1:
                    poses = self._avg_refine_traj(
                        traj[polish_iter - polish_avg:], que_Ks,
                        ref_info['center'], ref_info['norm_scale'])
            return poses
        return run

    def _fused_ref_info(self):
        """The ref_info subtree the fused program consumes (shared by
        predict_batch and bench.py's device-time/MFU probe)."""
        keys = ['det_ref_feats', 'sel_feats', 'sel_pose_embed', 'poses', 'Ks',
                'center']
        if self.refiner is not None:
            keys += ['refine_imgs', 'refine_poses', 'refine_Ks', 'norm_scale',
                     'norm_offset']
        return {k: self.ref_info[k] for k in keys}

    def predict_batch(self, que_imgs, que_Ks, mesh=None, shard_views=False,
                      block=True):
        """Batched fused prediction: que_imgs (qn,h,w,3) uint8/float,
        que_Ks (qn,3,3) -> poses (qn,3,4) numpy. The production serving path.

        ``block=False`` returns the device array without waiting: dispatch is
        async, so a server loop can enqueue batch k+1 while k computes
        (double-buffering hides the host->device upload and result readback;
        convert with np.asarray when needed).

        With ``mesh`` (a jax.sharding.Mesh with a 'dp' axis) the query batch is
        sharded over dp — the multi-chip pose server (BASELINE.json config #5);
        GSPMD inserts the collectives. qn must be divisible by the dp size.
        ``shard_views`` additionally shards the reference-view axis of every
        cache over the mesh's 'view' axis (the selector correlation tensor's
        rfn axis, the detector filter bank, the refiner view pool — this
        workload's sequence-parallelism analogue, SURVEY.md §2.10); rfn must be
        divisible by the view size.
        """
        que_imgs = self._pad_queries(np.asarray(que_imgs))
        u8_in = que_imgs.dtype == np.uint8
        fused = self._get('fused', self._fused_fn)
        ref_info = self._fused_ref_info()
        # ship uint8 over the host->device link (4x less than f32 — the
        # link dominates serving wall time on tunneled chips; docs/profile.md)
        # and convert on device in a separate small program: an elementwise op
        # feeding the backbone's first conv inside the fused program triggers
        # a pathological Mosaic compile (models/vgg.py normalization folding)
        que_imgs = jnp.asarray(que_imgs)
        if u8_in:
            que_imgs = self._get('u8_to_f32', lambda: jax.jit(
                lambda u: u.astype(jnp.float32) / 255.0))(que_imgs)
        que_Ks = jnp.asarray(que_Ks, jnp.float32)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            dp_sh = NamedSharding(mesh, P('dp'))
            rep = NamedSharding(mesh, P())
            que_imgs = jax.device_put(que_imgs, dp_sh)
            que_Ks = jax.device_put(que_Ks, dp_sh)
            if shard_views:
                # leading-rfn caches over 'view'; sel_feats are (an,rfn,...)
                view_specs = {
                    'det_ref_feats': P('view'),
                    'sel_feats': P(None, 'view'),
                    'sel_pose_embed': P('view'),
                    'poses': P('view'), 'Ks': P('view'),
                    'refine_imgs': P('view'), 'refine_poses': P('view'),
                    'refine_Ks': P('view'),
                }
                def put(k, x):
                    # recurse through the cache containers (the pyramid
                    # detector's ref cache is a dict of per-scale tuples)
                    if isinstance(x, dict):
                        return {kk: put(k, vv) for kk, vv in x.items()}
                    if isinstance(x, tuple):
                        return tuple(put(k, e) for e in x)
                    if not isinstance(x, jnp.ndarray):
                        return x
                    spec = view_specs.get(k)
                    sh = NamedSharding(mesh, spec) if spec is not None else rep
                    return jax.device_put(x, sh)
                ref_info = {k: put(k, v) for k, v in ref_info.items()}
            else:
                ref_info = jax.tree.map(
                    lambda x: jax.device_put(x, rep)
                    if isinstance(x, jnp.ndarray) else x, ref_info)
        if self.refiner_polish_params is not None:
            poses = fused(self.detector_params, self.selector_params,
                          self.refiner_params, que_imgs, que_Ks, ref_info,
                          self.refiner_polish_params)
        else:
            poses = fused(self.detector_params, self.selector_params,
                          self.refiner_params, que_imgs, que_Ks, ref_info)
        return np.asarray(poses) if block else poses

    def _get(self, name, maker):
        if name not in self._jit_cache:
            self._jit_cache[name] = maker()
        return self._jit_cache[name]

    def _pad_queries(self, que_imgs):
        """Zero-pad a (…,h,w,3) query stack bottom-right to the next
        cfg['query_bucket'] multiple (see default_cfg). Exact: K and all
        decode arithmetic are pad-invariant."""
        b = int(self.cfg.get('query_bucket') or 32)
        h, w = que_imgs.shape[-3], que_imgs.shape[-2]
        H, W = -(-h // b) * b, -(-w // b) * b
        if (H, W) == (h, w):
            return que_imgs
        pad = [(0, 0)] * (que_imgs.ndim - 3) + [(0, H - h), (0, W - w), (0, 0)]
        return np.pad(que_imgs, pad)

    # --------------------------------------------------------------- predict
    def predict(self, que_img, que_K, pose_init=None):
        """que_img: (h,w,3) uint8 or float [0,1], any resolution (padded to
        the cfg['query_bucket'] grid); que_K: (3,3). Returns (pose (3,4)
        numpy, inter_results dict). Mirrors estimator.py:173-216 incl.
        tracking mode (pose_init)."""
        que_img = self._pad_queries(np.asarray(que_img))
        if que_img.dtype == np.uint8:
            que_img = que_img.astype(np.float32) / 255.0
        que_img = jnp.asarray(que_img)
        que_K = jnp.asarray(que_K, jnp.float32)
        inter_results = {}

        if pose_init is None:
            detect = self._get('detect', self._detect_fn)
            position, scale_r2q = detect(self.detector_params, que_img[None],
                                         self.ref_info['det_ref_feats'])
            position, scale_r2q = position[0], scale_r2q[0]

            select = self._get('select', self._select_fn)
            crop, ref_idx, angle_r2q, scores = select(
                self.selector_params, que_img, que_K, position, scale_r2q,
                self.ref_info['sel_feats'], self.ref_info['sel_pose_embed'])

            inter_results.update({
                'det_position': np.asarray(position),
                'det_scale_r2q': float(scale_r2q),
                'det_que_img': np.asarray(crop),
                'sel_angle_r2q': float(angle_r2q),
                'sel_scores': np.asarray(scores),
                'sel_ref_idx': int(ref_idx),
            })

            pose_init_fn = self._get('pose_init', self._pose_init_fn)
            pose_pr = pose_init_fn(position, scale_r2q, angle_r2q,
                                   self.ref_info['poses'], self.ref_info['Ks'],
                                   que_K, self.ref_info['center'], ref_idx)
        else:
            pose_pr = jnp.asarray(pose_init, jnp.float32)

        if self.refiner is not None:
            refine = self._get('refine', self._refine_fn)
            refine_iter = self.cfg['refine_iter']
            polish_iter = 0
            if self.refiner_polish_params is not None:
                polish_iter = min(int(self.cfg.get('refine_polish_iter') or 0),
                                  refine_iter)
                refine_p = self._get('refine_polish', self._refine_polish_fn)
            main_iter = refine_iter - polish_iter

            def run_stage(pose_pr, fn, params, n_iter, avg_k, traj_out):
                # one cascade stage: n_iter refine steps, then optionally
                # average the last avg_k iterates (mirrors _fused_fn)
                stage_traj = []
                for _ in range(n_iter):
                    pose_pr = fn(params, que_img, que_K, pose_pr,
                                 self.ref_info['refine_imgs'],
                                 self.ref_info['refine_poses'],
                                 self.ref_info['refine_Ks'],
                                 self.ref_info['norm_scale'],
                                 self.ref_info['norm_offset'])
                    stage_traj.append(np.asarray(pose_pr))
                traj_out.extend(stage_traj)
                k = min(avg_k, n_iter)
                if k > 1:
                    avg = self._get('avg_refine', self._avg_refine_fn)
                    pose_pr = avg(jnp.asarray(stage_traj[-k:]), que_K,
                                  self.ref_info['center'],
                                  self.ref_info['norm_scale'])
                return pose_pr

            refine_poses = [np.asarray(pose_pr)]
            pose_pr = run_stage(pose_pr, refine, self.refiner_params,
                                main_iter,
                                int(self.cfg.get('refine_avg') or 0),
                                refine_poses)
            if polish_iter:
                pose_pr = run_stage(pose_pr, refine_p,
                                    self.refiner_polish_params, polish_iter,
                                    int(self.cfg.get('polish_avg') or 0),
                                    refine_poses)
            inter_results['refine_poses'] = refine_poses
        return np.asarray(pose_pr), inter_results
