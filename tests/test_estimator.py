"""End-to-end estimator tests on the synthetic scene (CPU).

Network weights are random (no pretrained checkpoints ship with this
environment), so these tests validate the PIPELINE: reference build products,
geometric pose-init accuracy with oracle detection/selection, the refine
composition (identity prediction => identity refinement), and that full
predict() executes with finite outputs and the reference's inter_results keys.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # full-network/pipeline compiles

from gen6d_tpu.data import database as D
from gen6d_tpu.data.synthetic import SyntheticScene
from gen6d_tpu.geometry.camera import project_points, view_correlation
from gen6d_tpu.geometry.rotations import rotation_angle
from gen6d_tpu.geometry.solvers import scale_rotation_difference_from_cameras
from gen6d_tpu.models.detector import Detector
from gen6d_tpu.models.refiner import VolumeRefiner
from gen6d_tpu.models.selector import ViewpointSelector
from gen6d_tpu.pipeline.estimator import Gen6DEstimator


def small_db(n_views=24, hw=(256, 320), seed=0):
    db = D.parse_database_name(f'synthetic/{n_views}')
    db.scene = SyntheticScene(n_views=n_views, hw=hw, dist=3.0, f=300.0, seed=seed)
    db.img_ids = [str(k) for k in range(n_views)]
    return db


@pytest.fixture(scope='module')
def models():
    key = jax.random.PRNGKey(0)
    det = Detector()
    det_params = det.init(key, jnp.zeros((2, 128, 128, 3)), jnp.zeros((1, 128, 128, 3)))
    sel = ViewpointSelector()
    poses = jnp.tile(jnp.eye(3, 4)[None], (3, 1, 1)).at[:, 2, 3].set(3.0)
    sel_params = sel.init(key, jnp.zeros((5, 3, 128, 128, 3)), poses,
                          jnp.zeros(3), jnp.asarray([0.0, 0, 1]),
                          jnp.zeros((1, 128, 128, 3)))
    refi = VolumeRefiner()
    K = jnp.asarray([[300.0, 0, 64], [0, 300, 64], [0, 0, 1]])[None]
    pose1 = jnp.eye(3, 4)[None].at[:, 2, 3].set(3.0)
    ref_params = refi.init(key, jnp.zeros((1, 128, 128, 3)), K, pose1,
                           jnp.zeros((1, 2, 128, 128, 3)),
                           jnp.tile(pose1[:, None], (1, 2, 1, 1)),
                           jnp.tile(K[:, None], (1, 2, 1, 1)))
    return (det, det_params), (sel, sel_params), (refi, ref_params)


@pytest.fixture(scope='module')
def built_estimator(models):
    det, sel, refi = models
    est = Gen6DEstimator({'ref_view_num': 8, 'det_ref_view_num': 4,
                          'refine_even_num': 16, 'refine_iter': 1},
                         detector=det, selector=sel, refiner=refi)
    db = small_db()
    est.build(db, 'all')
    return est, db


class TestBuild:
    def test_ref_info_shapes(self, built_estimator):
        est, db = built_estimator
        ri = est.ref_info
        assert ri['imgs'].shape == (8, 128, 128, 3)
        assert ri['ref_imgs'].shape == (5, 8, 128, 128, 3)
        assert ri['poses'].shape == (8, 3, 4)
        assert ri['refine_imgs'].shape[0] == 16
        assert len(ri['det_ref_feats']) == 3
        assert ri['sel_pose_embed'].shape == (8, 512)

    def test_rotated_copies_are_rotations(self, built_estimator):
        """angle index 2 is 0 rad -> identical to the plain crop."""
        est, _ = built_estimator
        base = np.array(est.ref_info['imgs'])
        rot0 = np.array(est.ref_info['ref_imgs'][2])
        np.testing.assert_allclose(rot0, base, atol=1e-4)
        # +-90 degree copies differ
        assert np.abs(np.array(est.ref_info['ref_imgs'][0]) - base).mean() > 1e-3


class TestPoseInit:
    def test_oracle_detection_selection(self, built_estimator):
        """With GT position/scale/angle/ref_idx the composed pose-init must be
        close to GT (limited only by ref-view quantization)."""
        est, db = built_estimator
        scene = db.scene
        que_pose = scene.poses[3]
        que_K = scene.K
        center = jnp.zeros(3)

        ref_poses = est.ref_info['poses']
        ref_Ks = est.ref_info['Ks']
        corr = view_correlation(jnp.asarray(que_pose)[None], ref_poses, center)
        ref_idx = int(jnp.argmax(corr[0]))

        scale, angle = scale_rotation_difference_from_cameras(
            ref_poses[ref_idx][None], jnp.asarray(que_pose)[None],
            ref_Ks[ref_idx][None], jnp.asarray(que_K)[None], center)
        pos, _ = project_points(center[None], jnp.asarray(que_pose),
                                jnp.asarray(que_K))

        fn = est._get('pose_init', est._pose_init_fn)
        pose_pr = np.array(fn(pos[0], scale[0], angle[0], ref_poses, ref_Ks,
                              jnp.asarray(que_K), center, ref_idx))
        ang_err = float(rotation_angle(jnp.asarray(pose_pr[:, :3] @ que_pose[:, :3].T)))
        # ref view direction differs from the query view; error bounded by it
        cosv = float(corr[0, ref_idx])
        assert ang_err <= np.arccos(np.clip(cosv, -1, 1)) + 0.06
        cam_err = np.linalg.norm(
            (-pose_pr[:, :3].T @ pose_pr[:, 3]) - (-que_pose[:, :3].T @ que_pose[:, 3]))
        assert cam_err < 0.4


class MockRefiner:
    """Refiner stand-in predicting the identity similarity transform."""

    def apply(self, params, que_imgs, que_Ks, que_poses, ref_imgs, ref_poses,
              ref_Ks):
        qn = que_imgs.shape[0]
        return {'rotation': jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (qn, 1)),
                'offset': jnp.zeros((qn, 2)),
                'scale': jnp.zeros((qn, 1))}


class TestRefineComposition:
    def test_identity_prediction_preserves_pose(self, models):
        """refine step geometry: identity network prediction must return the
        input pose exactly (warp -> compose -> unwarp round trip)."""
        det, sel, _ = models
        est = Gen6DEstimator({'ref_view_num': 8, 'det_ref_view_num': 4,
                              'refine_even_num': 12, 'refine_iter': 1},
                             detector=det, selector=sel,
                             refiner=(MockRefiner(), {}))
        db = small_db()
        est.build(db, 'all')
        pose_in = db.scene.poses[5]
        refine = est._get('refine', est._refine_fn)
        out = np.array(refine({}, jnp.asarray(db.scene.render(5)[0], jnp.float32) / 255.0,
                              jnp.asarray(db.scene.K), jnp.asarray(pose_in),
                              est.ref_info['refine_imgs'],
                              est.ref_info['refine_poses'],
                              est.ref_info['refine_Ks'],
                              est.ref_info['norm_scale'],
                              est.ref_info['norm_offset']))
        ang = float(rotation_angle(jnp.asarray(out[:, :3] @ pose_in[:, :3].T)))
        assert ang < 1e-3
        np.testing.assert_allclose(out[:, 3], pose_in[:, 3], atol=1e-3)

    def test_identity_preserved_with_canonical_staging(self, models):
        """refine_canon_size staging replaces the full-res refine views with
        vert-rectified canonical crops carrying their own crop cameras. The
        crops remain valid posed images, so the identity-prediction round
        trip must still return the input pose exactly — and the staged stack
        must carry the canonical resolution."""
        det, sel, _ = models
        est = Gen6DEstimator({'ref_view_num': 8, 'det_ref_view_num': 4,
                              'refine_even_num': 12, 'refine_iter': 1,
                              'refine_canon_size': 96,
                              'refine_canon_margin': 0.4},
                             detector=det, selector=sel,
                             refiner=(MockRefiner(), {}))
        db = small_db()
        est.build(db, 'all')
        assert est.ref_info['refine_imgs'].shape[1:] == (96, 96, 3)
        pose_in = db.scene.poses[5]
        refine = est._get('refine', est._refine_fn)
        out = np.array(refine({}, jnp.asarray(db.scene.render(5)[0], jnp.float32) / 255.0,
                              jnp.asarray(db.scene.K), jnp.asarray(pose_in),
                              est.ref_info['refine_imgs'],
                              est.ref_info['refine_poses'],
                              est.ref_info['refine_Ks'],
                              est.ref_info['norm_scale'],
                              est.ref_info['norm_offset']))
        ang = float(rotation_angle(jnp.asarray(out[:, :3] @ pose_in[:, :3].T)))
        assert ang < 1e-3
        np.testing.assert_allclose(out[:, 3], pose_in[:, 3], atol=1e-3)


class TestRefineAveraging:
    def test_avg_traj_fixed_point(self, built_estimator):
        """Averaging a trajectory of identical poses must return that pose
        (project -> mean -> PnP re-solve is exact at consensus)."""
        est, db = built_estimator
        pose = jnp.asarray(db.scene.poses[3])
        traj = jnp.tile(pose[None, None], (3, 1, 1, 1))  # (k=3, qn=1, 3, 4)
        out = np.array(est._avg_refine_traj(
            traj, jnp.asarray(db.scene.K)[None], est.ref_info['center'],
            est.ref_info['norm_scale']))[0]
        ang = float(rotation_angle(jnp.asarray(out[:, :3]) @ pose[:, :3].T))
        assert ang < 1e-3
        np.testing.assert_allclose(out[:, 3], pose[:, 3], atol=1e-3)

    def test_avg_traj_reduces_jitter(self, built_estimator):
        """Symmetric translation jitter around a target pose must average
        out: the averaged pose is closer to the target than the iterates."""
        est, db = built_estimator
        pose = np.asarray(db.scene.poses[3])
        eps = np.zeros((3, 4), np.float32)
        eps[0, 3] = 0.05
        traj = jnp.asarray(np.stack([pose + eps, pose - eps, pose + eps,
                                     pose - eps])[:, None])
        out = np.array(est._avg_refine_traj(
            traj, jnp.asarray(db.scene.K)[None], est.ref_info['center'],
            est.ref_info['norm_scale']))[0]
        err_avg = np.linalg.norm(out[:, 3] - pose[:, 3])
        assert err_avg < 0.25 * np.linalg.norm(eps[:, 3])

    def test_predict_with_refine_avg(self, models):
        det, sel, refi = models
        est = Gen6DEstimator({'ref_view_num': 8, 'det_ref_view_num': 4,
                              'refine_even_num': 12, 'refine_iter': 3,
                              'refine_avg': 3},
                             detector=det, selector=sel, refiner=refi)
        db = small_db()
        est.build(db, 'all')
        img, _ = db.scene.render(1)
        pose, inter = est.predict(img, db.scene.K)
        assert pose.shape == (3, 4) and np.all(np.isfinite(pose))
        # fused batch path agrees in shape and stays finite too
        poses = est.predict_batch(np.stack([img, img]),
                                  np.stack([db.scene.K, db.scene.K]))
        assert poses.shape == (2, 3, 4) and np.all(np.isfinite(poses))


class TestPredict:
    def test_full_predict_runs(self, built_estimator):
        est, db = built_estimator
        img, _ = db.scene.render(1)
        pose, inter = est.predict(img, db.scene.K)
        assert pose.shape == (3, 4) and np.all(np.isfinite(pose))
        for k in ('det_position', 'det_scale_r2q', 'det_que_img',
                  'sel_angle_r2q', 'sel_scores', 'sel_ref_idx', 'refine_poses'):
            assert k in inter, k

    def test_predict_batch_matches_sequential(self, built_estimator):
        """The fused batched program must reproduce the per-stage path."""
        est, db = built_estimator
        imgs = np.stack([db.scene.render(i)[0] for i in (1, 4)], 0)
        Ks = np.stack([db.scene.K] * 2, 0)
        batch_poses = est.predict_batch(imgs, Ks)
        assert batch_poses.shape == (2, 3, 4)
        for i in range(2):
            pose_i, _ = est.predict(imgs[i], Ks[i])
            np.testing.assert_allclose(batch_poses[i], pose_i, atol=2e-3)

    def test_polish_cascade_identity_params(self, models):
        """With the polish net sharing the coarse net's weights, the cascade
        (refine_polish_iter) must reproduce the single-net program exactly —
        in the fused batch path and the per-stage predict path."""
        det, sel, refi = models
        db = small_db()
        cfg = {'ref_view_num': 8, 'det_ref_view_num': 4,
               'refine_even_num': 16, 'refine_iter': 2}
        est0 = Gen6DEstimator(cfg, detector=det, selector=sel, refiner=refi)
        est0.build(db, 'synthetic_split')
        est1 = Gen6DEstimator({**cfg, 'refine_polish_iter': 1},
                              detector=det, selector=sel, refiner=refi,
                              refiner_polish=refi)
        est1.ref_info = est0.ref_info
        img, _ = db.scene.render(1)
        imgs, Ks = img[None], np.stack([db.scene.K])
        np.testing.assert_allclose(est1.predict_batch(imgs, Ks),
                                   est0.predict_batch(imgs, Ks), atol=2e-3)
        p0, _ = est0.predict(img, db.scene.K)
        p1, _ = est1.predict(img, db.scene.K)
        np.testing.assert_allclose(p1, p0, atol=2e-3)

    def test_predict_batch_dp_sharded(self, built_estimator):
        """The fused program under a dp mesh (multi-chip pose server) must
        reproduce the single-device result."""
        import jax
        from gen6d_tpu.parallel.sharding import make_mesh
        est, db = built_estimator
        mesh = make_mesh(jax.devices()[:4], dp=4, view=1)
        imgs = np.stack([db.scene.render(i)[0] for i in (0, 2, 5, 7)], 0)
        Ks = np.stack([db.scene.K] * 4, 0)
        ref = est.predict_batch(imgs, Ks)
        with mesh:
            sharded = est.predict_batch(imgs, Ks, mesh=mesh)
        np.testing.assert_allclose(sharded, ref, atol=1e-3)

    def test_mixed_query_resolutions(self, built_estimator):
        """Arbitrary query resolutions in ONE session (SURVEY §7 hard part 2):
        non-/32 sizes are zero-padded to the query_bucket grid — identical to
        the caller pre-padding — and a second bucket just retraces."""
        est, db = built_estimator
        img, _ = db.scene.render(3)  # 256x320
        K = db.scene.K
        crop = img[:249, :311]
        padded = np.zeros_like(img)
        padded[:249, :311] = crop
        p1, _ = est.predict(crop, K)
        p2, _ = est.predict(padded, K)
        np.testing.assert_allclose(p1, p2, atol=1e-4)
        p3 = est.predict_batch(crop[None], np.asarray(K)[None])
        np.testing.assert_allclose(p3[0], p1, atol=2e-3)
        sq = img[:192, :192]  # second bucket in the same session
        p4, _ = est.predict(sq, K)
        assert np.all(np.isfinite(p4))

    def test_tracking_mode(self, built_estimator):
        """pose_init given -> detection/selection skipped (estimator.py:206-215)."""
        est, db = built_estimator
        img, _ = db.scene.render(2)
        pose, inter = est.predict(img, db.scene.K, pose_init=db.scene.poses[2])
        assert 'det_position' not in inter
        assert np.all(np.isfinite(pose))

    def test_predict_batch_view_sharded(self, built_estimator):
        """The fused program with view-sharded reference caches (the
        reference-view parallel axis, SURVEY.md §2.10) must reproduce the
        single-device result."""
        import jax
        from gen6d_tpu.parallel.sharding import make_mesh
        est, db = built_estimator
        mesh = make_mesh(jax.devices()[:4], dp=2, view=2)
        imgs = np.stack([db.scene.render(i)[0] for i in (0, 5)], 0)
        Ks = np.stack([db.scene.K] * 2, 0)
        ref = est.predict_batch(imgs, Ks)
        with mesh:
            sharded = est.predict_batch(imgs, Ks, mesh=mesh, shard_views=True)
        np.testing.assert_allclose(sharded, ref, atol=1e-3)


class TestGenValSetRoundTrip:
    def test_prepare_then_refiner_val(self, models, tmp_path, monkeypatch):
        """gen_val_set caches det/sel predictions; RefinerValData consumes
        them (reference prepare.py:44-71 -> train_dataset.py:1475-1581)."""
        from gen6d_tpu.cli.prepare import prepare_validation_set
        from gen6d_tpu.train.datasets import RefinerValData
        det, sel, refi = models
        est = Gen6DEstimator({'ref_view_num': 8, 'det_ref_view_num': 4,
                              'refine_even_num': 16, 'refine_iter': 1},
                             detector=det, selector=sel, refiner=None)
        name = 'synthetic/16'
        out_root = str(tmp_path / 'val')
        det_info, sel_info = prepare_validation_set(
            name, name, 'synthetic_split', 'synthetic_split', None,
            out_root=out_root, estimator=est)
        assert len(det_info) == 4  # 16 views -> every 4th is a query

        rv = RefinerValData(name, ref_split='synthetic_split',
                            val_root=out_root, ref_num=4, ref_even_num=8)
        assert len(rv) == 4
        batch = rv.batch(np.arange(2))
        assert batch['que_imgs'].shape == (2, 128, 128, 3)
        assert batch['ref_imgs'].shape == (2, 4, 128, 128, 3)
        for v in batch.values():
            assert np.all(np.isfinite(np.asarray(v)))


class TestServingCalibrations:
    """The det/refine calibration hooks (cfg['det_scale_correction'],
    cfg['refine_scale_correction'], cfg['refine_rot_correction']) — pure
    decode-side math, tested without networks."""

    def _bare(self, cfg):
        from gen6d_tpu.pipeline.estimator import Gen6DEstimator
        est = Gen6DEstimator.__new__(Gen6DEstimator)
        est.cfg = {**Gen6DEstimator.default_cfg, **cfg}
        return est

    def test_det_scale_correction_scales_decode(self):
        import jax.numpy as jnp
        import numpy as np
        est0 = self._bare({})
        est1 = self._bare({'det_scale_correction': -0.5})
        qn, h, w = 2, 4, 5
        rng = np.random.RandomState(0)
        out = {'scores': jnp.asarray(rng.randn(qn, h, w, 1), jnp.float32),
               'select_pr_scale': jnp.asarray(rng.randn(qn, h, w, 1),
                                              jnp.float32),
               'select_pr_offset': jnp.zeros((qn, h, w, 2), jnp.float32)}
        p0, s0 = est0._decode_det(out)
        p1, s1 = est1._decode_det(out)
        np.testing.assert_allclose(np.asarray(p0), np.asarray(p1))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s0) * 2 ** -0.5,
                                   rtol=1e-5)

    def test_refine_rot_correction_undoes_bias(self):
        # q_pred == bias quat -> corrected rotation is identity
        import jax.numpy as jnp
        import numpy as np
        from gen6d_tpu.geometry.rotations import mat_to_quat, quat_to_mat
        bias = np.asarray([0.999717, 0.017072, 0.015171, -0.006677])
        bias = bias / np.linalg.norm(bias)
        R_corr = quat_to_mat(jnp.asarray(bias, jnp.float32)).T
        R_eff = np.asarray(R_corr @ quat_to_mat(jnp.asarray(bias, jnp.float32)))
        np.testing.assert_allclose(R_eff, np.eye(3), atol=1e-5)
        # and mat_to_quat of the corrected matrix is the identity quat
        q = np.asarray(mat_to_quat(jnp.asarray(R_eff)))
        np.testing.assert_allclose(q, [1, 0, 0, 0], atol=1e-4)


class TestEvalCLIOnLINEMODFixture:
    def test_eval_end_to_end(self, models, tmp_path, monkeypatch):
        """cli/eval.py end-to-end on a fabricated LINEMOD on-disk tree
        (reference eval.py:87-152 over dataset/database.py:56-105): exercises
        the LINEMOD split/model/diameter paths through estimator build,
        batched predict, metric computation and the performance.log append."""
        import gen6d_tpu.data.database as dbm
        from gen6d_tpu.cli.eval import evaluate
        from tests.test_data import make_linemod_fixture
        make_linemod_fixture(tmp_path / 'LINEMOD', n=8, hw=(128, 160))
        monkeypatch.setattr(dbm, 'LINEMOD_ROOT', str(tmp_path / 'LINEMOD'))
        monkeypatch.chdir(tmp_path)

        det, sel, refi = models
        est = Gen6DEstimator({'ref_view_num': 4, 'det_ref_view_num': 4,
                              'refine_even_num': 4, 'refine_ref_num': 2,
                              'refine_iter': 1},
                             detector=det, selector=sel, refiner=refi)
        results = evaluate(None, 'linemod/cat', batch=2, vis_interval=2,
                           output_root=str(tmp_path / 'eval'), estimator=est)
        # random weights: metrics are finite, not accurate
        for k in ('add-0.1d', 'prj-5', 'poses_per_sec'):
            assert np.isfinite(results[k]), (k, results)
        out = tmp_path / 'eval' / 'linemod_cat'
        assert (out / 'poses.pkl').exists()
        assert any(out.glob('*-bbox.jpg'))
        assert 'linemod/cat' in (tmp_path / 'data' /
                                 'performance.log').read_text()
