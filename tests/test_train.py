"""Training subsystem tests: losses vs torch, GT math, on-device batch
builders, and train-step smoke tests (loss decreases on a fixed batch)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from gen6d_tpu.geometry import solvers
from gen6d_tpu.geometry.rotations import rotation_angle
from gen6d_tpu.train import losses as L
from gen6d_tpu.train import metrics as M
from gen6d_tpu.train.datasets import SyntheticTrainData
from gen6d_tpu.train.lr import exp_decay_lr, warm_up_exp_decay_lr


def look_at(campos):
    campos = np.asarray(campos, np.float64)
    z = -campos / np.linalg.norm(campos)
    x = np.cross(z, [0, 1, 0])
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z], 0)
    return np.concatenate([R, (-R @ campos)[:, None]], 1).astype(np.float32)


class TestLosses:
    def test_bce_matches_torch(self, rng):
        logits = rng.randn(4, 10).astype(np.float32)
        labels = (rng.rand(4, 10) > 0.5).astype(np.float32)
        ours = np.array(L.bce_with_logits(jnp.asarray(logits), jnp.asarray(labels)))
        ref = F.binary_cross_entropy_with_logits(
            torch.from_numpy(logits), torch.from_numpy(labels),
            reduction='none').numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_detection_score_loss_positive_label(self, rng):
        """Score loss drops when the heatmap peaks at the GT cell."""
        qn, h, w = 2, 16, 16
        cens = jnp.asarray([[60.0, 36.0], [20.0, 100.0]])
        good = np.full((qn, h, w, 1), -6.0, np.float32)
        for qi in range(qn):
            cx, cy = np.round((np.array(cens[qi]) + 0.5) / 8 - 0.5).astype(int)
            good[qi, cy, cx, 0] = 6.0
        bad = -good
        lg = L.detection_score_loss(jnp.asarray(good), cens)
        lb = L.detection_score_loss(jnp.asarray(bad), cens)
        assert np.all(np.array(lg) < np.array(lb))

    def test_offset_scale_loss_zero_at_gt(self):
        qn, h, w = 1, 8, 8
        cens = jnp.asarray([[35.5, 27.5]])  # cell (4,3)+0.0 offset
        center_cell = (np.array(cens[0]) + 0.5) / 8 - 0.5
        offset = np.zeros((qn, h, w, 2), np.float32)
        coords = np.stack(np.meshgrid(np.arange(w), np.arange(h)), -1).astype(np.float32)
        offset[0] = center_cell - coords
        scale = np.full((qn, h, w, 1), np.log2(1.7), np.float32)
        lo, ls = L.detection_offset_scale_loss(jnp.asarray(offset), jnp.asarray(scale),
                                               cens, jnp.asarray([1.7]))
        assert float(lo[0]) < 1e-8 and float(ls[0]) < 1e-8

    def test_selection_loss_prefers_gt(self, rng):
        qn, rfn = 2, 8
        scores_gt = jnp.asarray(rng.rand(qn, rfn).astype(np.float32))
        logits_good = 8 * (scores_gt - 0.5)
        logits_bad = -logits_good
        angles = jnp.zeros((qn, rfn))
        ids = jnp.argmax(scores_gt, 1)
        lg, _ = L.selection_loss(logits_good, scores_gt, angles, jnp.zeros(qn), ids)
        lb, _ = L.selection_loss(logits_bad, scores_gt, angles, jnp.zeros(qn), ids)
        assert np.all(np.array(lg) < np.array(lb))

    def test_refiner_loss_raw_zero_for_gt(self, rng):
        """'raw' loss space: identical pred/GT decompositions null the loss."""
        qn, pn = 2, 32
        quat = jnp.tile(jnp.asarray([1.0, 0, 0, 0])[None], (qn, 1))
        offset = jnp.asarray(rng.randn(qn, 2).astype(np.float32))
        scale = jnp.asarray(rng.rand(qn, 1).astype(np.float32) + 0.5)
        grids = jnp.asarray(rng.rand(qn, pn, 3).astype(np.float32))
        center = jnp.zeros((qn, 3))
        poses = jnp.tile(jnp.asarray(look_at([0.1, 0.1, -2.5]))[None], (qn, 1, 1))
        loss = L.refiner_loss_raw(quat, offset, jnp.log2(scale), quat, offset,
                                  scale[:, 0], grids, center, poses)
        assert np.all(np.array(loss) < 1e-10)

    def test_refiner_loss_zero_for_gt_transform(self, rng):
        """Predicting exactly the GT similarity decomposition nulls the loss."""
        qn, pn = 1, 64
        pose_in = jnp.asarray(look_at([0.2, 0.1, -2.5]))[None]
        pose_tgt = jnp.asarray(look_at([0.21, 0.12, -2.3]))[None]
        K = jnp.asarray([[300.0, 0, 64], [0, 300, 64], [0, 0, 1]])[None]
        center = jnp.zeros((1, 3))
        sim = solvers.approximate_rigid_to_similarity(
            pose_in[0], pose_tgt[0], K[0], K[0], center[0])[None]
        scale, quat, offset = solvers.decompose_similarity(
            pose_in[0], sim[0], center[0])
        grids = jnp.asarray(rng.rand(qn, pn, 3).astype(np.float32))
        loss = L.refiner_loss(quat[None], offset[None, :2],
                              jnp.log2(scale)[None, None], grids, center,
                              pose_in, sim)
        assert float(loss[0]) < 1e-6


class TestGTMath:
    def test_sim_roundtrip_to_rigid(self):
        """approximate_rigid_to_similarity -> pose_sim_to_pose_rigid recovers
        the target pose for nearby views."""
        K = jnp.asarray([[300.0, 0, 64], [0, 300, 64], [0, 0, 1]])
        center = jnp.zeros(3)
        pose_in = jnp.asarray(look_at([0.2, 0.1, -2.5]))
        pose_tgt = jnp.asarray(look_at([0.23, 0.13, -2.2]))
        sim = solvers.approximate_rigid_to_similarity(pose_in, pose_tgt, K, K,
                                                      center)
        rec = solvers.pose_sim_to_pose_rigid(sim, pose_in, K, K, center)
        ang = float(rotation_angle(rec[:, :3] @ pose_tgt[:, :3].T))
        assert ang < 1e-4
        np.testing.assert_allclose(np.array(rec[:, 3]), np.array(pose_tgt[:, 3]),
                                   atol=5e-3)


class TestLR:
    def test_exp_decay(self):
        s = exp_decay_lr(1e-4, 1000, 0.5)
        assert float(s(0)) == pytest.approx(1e-4)
        assert float(s(1000)) == pytest.approx(5e-5)
        assert float(s(10 ** 7)) == pytest.approx(1e-5)

    def test_warmup(self):
        s = warm_up_exp_decay_lr(1e-6, 100, 1e-4, 1000, 0.5)
        assert float(s(50)) == pytest.approx(1e-6)
        assert float(s(100)) == pytest.approx(1e-4)


class TestMetrics:
    def test_detection_iou_perfect(self):
        pos = jnp.asarray([[50.0, 60.0]])
        iou = M.detection_iou(pos, jnp.asarray([1.3]), pos, jnp.asarray([1.3]))
        assert float(iou[0]) == pytest.approx(1.0)

    def test_selection_metrics(self):
        logits = jnp.asarray([[0.1, 0.9, 0.2]])
        gt = jnp.asarray([[0.0, 1.0, 0.5]])
        out = M.selection_metrics(logits, gt, jnp.zeros((1, 3)), jnp.zeros(1),
                                  jnp.asarray([1]))
        assert float(out['sel_acc_1'][0]) == 1.0
        assert float(out['sel_ang_5'][0]) == 1.0


@pytest.fixture(scope='module')
def tdata():
    # single clean scene: the GT-math tests need the object to be the only
    # content (no distractors/backgrounds)
    return SyntheticTrainData(n_views=24, scenes=('cube-checks@0',),
                              augment=False, distractors=False)


@pytest.fixture(scope='module')
def tdata_aug():
    # multi-scene pool with the full augmentation pipeline on
    return SyntheticTrainData(n_views=12,
                              scenes=('cube-checks@0', 'oct-stripes@2'))


@pytest.mark.slow
class TestBatchBuilders:
    def test_det_batch(self, tdata):
        b = tdata.det_batch(jax.random.PRNGKey(0), qn=2, que_size=256)
        assert b['que_imgs'].shape == (2, 256, 256, 3)
        assert b['ref_imgs'].shape[1:] == (128, 128, 3)
        assert np.all(np.isfinite(np.array(b['scale_diff'])))
        # GT center: the object must actually be there — compare against the
        # warped mask centroid
        cens = np.array(b['cens'])
        assert np.all(cens > 0) and np.all(cens < 256)

    def test_det_batch_center_matches_object(self, tdata):
        """The rendered object's centroid must sit near the GT center."""
        b = tdata.det_batch(jax.random.PRNGKey(3), qn=2, que_size=256)
        imgs = np.array(b['que_imgs'])
        cens = np.array(b['cens'])
        for qi in range(2):
            # object pixels differ from the constant background
            bg = np.median(imgs[qi].reshape(-1, 3), 0)
            m = np.abs(imgs[qi] - bg).sum(-1) > 0.2
            if m.sum() < 50:
                continue
            ys, xs = np.nonzero(m)
            assert abs(xs.mean() - cens[qi, 0]) < 25
            assert abs(ys.mean() - cens[qi, 1]) < 25

    def test_sel_batch(self, tdata):
        b = tdata.sel_batch(jax.random.PRNGKey(1), qn=2)
        assert b['ref_imgs'].shape[0] == 5
        assert b['que_imgs'].shape == (2, 128, 128, 3)
        assert b['ref_vp_scores'].shape[0] == 2
        assert np.all(np.abs(np.array(b['angles_r2q'])) < np.pi)

    def test_det_batch_augmented(self, tdata_aug):
        """Multi-scene pool + backgrounds/distractors/photometric aug: batches
        stay finite, in range, with valid GT."""
        b = tdata_aug.det_batch(jax.random.PRNGKey(7), qn=2, que_size=256)
        imgs = np.asarray(b['que_imgs'])
        assert np.all(np.isfinite(imgs))
        assert imgs.min() >= 0.0 and imgs.max() <= 1.0
        assert np.all(np.asarray(b['scale_diff']) > 0)
        s = tdata_aug.sel_batch(jax.random.PRNGKey(8), qn=2)
        assert np.all(np.isfinite(np.asarray(s['que_imgs'])))

    def test_scene_sampling_varies(self, tdata_aug):
        """Different keys hit different scenes of the pool."""
        sis = set()
        for i in range(8):
            key = jax.random.PRNGKey(i)
            import jax.random as jr
            si = int(jr.randint(jr.split(key, 12)[0], (), 0,
                                tdata_aug.pool['imgs'].shape[0]))
            sis.add(si)
        assert len(sis) > 1

    def test_ref_batch(self, tdata):
        b = tdata.ref_batch(jax.random.PRNGKey(2), qn=2, ref_num=4)
        assert b['que_imgs'].shape == (2, 128, 128, 3)
        assert b['ref_imgs'].shape == (2, 4, 128, 128, 3)
        # GT similarity transform must be consistent: decompose + refiner loss
        # with the GT decomposition ~ 0
        scale, quat, offset = jax.vmap(solvers.decompose_similarity)(
            b['que_poses_in'], b['poses_sim_in_to_que'], b['object_center'])
        grids = jax.vmap(lambda p: jnp.asarray(
            np.random.RandomState(0).rand(32, 3).astype(np.float32)))(jnp.arange(2))
        from gen6d_tpu.geometry.pose import pose_apply
        g = pose_apply(b['que_poses_in'], grids)
        loss = L.refiner_loss(quat, offset[:, :2], jnp.log2(scale)[:, None], g,
                              b['object_center'], b['que_poses_in'],
                              b['poses_sim_in_to_que'])
        assert np.all(np.array(loss) < 1e-4)


@pytest.mark.slow
class TestStreamingPool:
    """Bounded-HBM streaming of file-backed scenes (max_staged_views +
    restage): the staged window holds the FPS reference views plus a rotating
    random fill reloaded from disk through ref_prep.gather_images (the native
    pthread loader for file-backed databases). The reference instead streams
    per-item in DataLoader workers (train_dataset.py:99-119)."""

    def test_window_staging_and_restage(self, tmp_path, monkeypatch):
        import gen6d_tpu.data.database as dbm
        from tests.test_data import make_linemod_fixture
        make_linemod_fixture(tmp_path / 'LINEMOD', model_name='cat', n=12,
                             hw=(128, 160))
        monkeypatch.setattr(dbm, 'LINEMOD_ROOT', str(tmp_path / 'LINEMOD'))
        db = dbm.parse_database_name('linemod/cat')

        data = SyntheticTrainData(scenes=[db], ref_num=4, size=64,
                                  max_staged_views=8, augment=False,
                                  distractors=False)
        # device pool is bounded at the window size, not the scene size
        assert data.pool['imgs'].shape[:2] == (1, 8)
        assert len(data._stream_state) == 1
        key = jax.random.PRNGKey(0)
        det = data.det_batch(key, qn=2, que_size=128)
        assert np.all(np.isfinite(np.asarray(det['que_imgs'])))

        before = np.asarray(data.pool['imgs'][0]).copy()
        before_poses = np.asarray(data.pool['poses'][0]).copy()
        swapped = data.restage()
        assert swapped == 4  # 8 staged - 4 pinned FPS refs
        after = np.asarray(data.pool['imgs'][0])
        after_poses = np.asarray(data.pool['poses'][0])
        # pinned reference slots unchanged; at least one fill slot rotated
        np.testing.assert_array_equal(before[:4], after[:4])
        assert not np.array_equal(before_poses[4:], after_poses[4:])
        # same shapes/dtypes -> the jitted builders keep their cache
        det2 = data.det_batch(jax.random.PRNGKey(1), qn=2, que_size=128)
        assert det2['que_imgs'].shape == det['que_imgs'].shape
        sel = data.sel_batch(jax.random.PRNGKey(2), qn=2)
        assert np.all(np.isfinite(np.asarray(sel['que_imgs'])))
        ref = data.ref_batch(jax.random.PRNGKey(3), qn=1, ref_num=2)
        assert np.all(np.isfinite(np.asarray(ref['que_imgs'])))

    def test_small_scene_not_streamed(self):
        data = SyntheticTrainData(n_views=8, ref_num=4, size=64,
                                  scenes=('cube-checks@0',),
                                  max_staged_views=16, augment=False,
                                  distractors=False)
        assert data._stream_state == []
        assert data.pool['imgs'].shape[:2] == (1, 8)


@pytest.mark.slow
class TestSamplingAndBackgrounds:
    """Per-scene sampling probabilities (reference train_dataset.py:240-258)
    and real-image background compositing (reference :99-119,260-291)."""

    def test_scene_probs_respected(self):
        data = SyntheticTrainData(n_views=8, ref_num=4, size=64,
                                  scenes=('cube-checks@0', 'oct-stripes@2'),
                                  scene_probs=[1.0, 0.0], augment=False,
                                  distractors=False)
        picks = [int(data._rand_scene(jax.random.PRNGKey(i)))
                 for i in range(16)]
        assert set(picks) == {0}

    def test_scene_probs_validated(self):
        with pytest.raises(ValueError):
            SyntheticTrainData(n_views=8, ref_num=4, size=64,
                               scenes=('cube-checks@0',),
                               scene_probs=[0.5, 0.5])

    def test_background_dir_compositing(self, tmp_path):
        from PIL import Image as PILImage
        rng = np.random.RandomState(0)
        for i in range(3):
            arr = rng.randint(0, 255, (96, 80, 3), np.uint8)
            PILImage.fromarray(arr).save(tmp_path / f'bg{i}.png')
        data = SyntheticTrainData(n_views=8, ref_num=4, size=64,
                                  scenes=('cube-checks@0',),
                                  background_dir=str(tmp_path),
                                  background_res=128)
        assert data.pool['bg'].shape == (3, 128, 128, 3)
        assert data.pool['bg'].dtype == jnp.uint8
        b = data.det_batch(jax.random.PRNGKey(0), qn=2, que_size=256)
        q = np.asarray(b['que_imgs'])
        assert q.shape == (2, 256, 256, 3)
        assert np.all(np.isfinite(q)) and q.max() > 0.1

    def test_background_crop_smaller_than_pool(self, tmp_path):
        # crop size > staged res exercises the resize fallback
        from PIL import Image as PILImage
        PILImage.fromarray(np.zeros((40, 40, 3), np.uint8)).save(
            tmp_path / 'bg.png')
        data = SyntheticTrainData(n_views=8, ref_num=4, size=64,
                                  scenes=('cube-checks@0',),
                                  background_dir=str(tmp_path),
                                  background_res=48)
        bg = data._background(jax.random.PRNGKey(0), 2, 64, data.pool)
        assert bg.shape == (2, 64, 64, 3)
        assert np.all(np.isfinite(np.asarray(bg)))


class TestWeightsIO:
    def test_npz_roundtrip_mixed_tree(self, tmp_path):
        """weights_io snapshots restore the exact tree structure/dtypes;
        f32 leaves round-trip through f16 within snapshot precision."""
        from gen6d_tpu.models.weights_io import (load_params_npz,
                                                 save_params_npz)
        params = {'params': {
            'conv': {'kernel': jnp.asarray(
                np.random.RandomState(0).randn(3, 3, 4, 8), jnp.float32)},
            'bn': {'mean': jnp.zeros(8), 'var': jnp.ones(8)},
            'step': jnp.asarray(7, jnp.int32),
            'big': jnp.asarray([1e5, -2e5], jnp.float32),  # f16 overflow -> f32
        }}
        path = str(tmp_path / 'snap.npz')
        save_params_npz(params, path)
        ref = jax.tree.map(jnp.zeros_like, params)
        back = load_params_npz(path, ref)
        assert jax.tree_util.tree_structure(back) == \
            jax.tree_util.tree_structure(params)
        for (kp, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(params)[0],
                jax.tree_util.tree_flatten_with_path(back)[0]):
            assert a.dtype == b.dtype, kp
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-6)
        # overflow-guarded leaf must be exact
        np.testing.assert_array_equal(np.asarray(back['params']['big']),
                                      np.asarray(params['params']['big']))

    def test_npz_missing_key_raises(self, tmp_path):
        from gen6d_tpu.models.weights_io import (load_params_npz,
                                                 save_params_npz)
        params = {'a': jnp.zeros(3)}
        path = str(tmp_path / 'snap.npz')
        save_params_npz(params, path)
        with pytest.raises(KeyError):
            load_params_npz(path, {'a': jnp.zeros(3), 'b': jnp.zeros(2)})


@pytest.mark.slow
def test_ref_batch_gt_init_mode():
    """ref_gt_init_frac=1: the refiner input pose is the GT pose orbited
    <= ref_vp_noise deg (serving's later-iteration distribution), vs the
    top-8 reference-view mode whose out-of-plane gap is tens of degrees
    (docs/refiner_head_jitter.md rotation-bias root cause)."""
    import jax
    from gen6d_tpu.geometry.rotations import rotation_angle
    from gen6d_tpu.train.datasets import SyntheticTrainData

    def gaps(frac):
        d = SyntheticTrainData(scenes=['cube-stripes@10'], n_views=16,
                               ref_gt_init_frac=frac, ref_vp_noise=5.0,
                               ref_scale_noise=0.05, ref_rot_noise=2.0,
                               ref_off_std=0.5, augment=False,
                               distractors=False)
        b = d.ref_batch(jax.random.PRNGKey(0), qn=4)
        Rin = np.asarray(b['que_poses_in'])[:, :, :3]
        Rq = np.asarray(b['que_poses_warp'])[:, :, :3]
        return np.asarray([np.degrees(float(rotation_angle(Rin[i] @ Rq[i].T)))
                           for i in range(4)])

    g_gt = gaps(1.0)
    g_top8 = gaps(0.0)
    # vp orbit 5 deg + in-plane warp noise 2 deg (+ small numerics)
    assert np.all(g_gt <= 8.0), g_gt
    assert np.median(g_top8) > 15.0, g_top8
