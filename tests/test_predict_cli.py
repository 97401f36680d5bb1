"""predict CLI coverage: temporal smoothing math (fast) and the full
video -> frames -> tracking -> smoothing -> PnP loop (slow tier), reference
predict.py:18-96."""
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestWeightedPts:
    def test_matches_reference_semantics(self):
        """Exp-decay weights over the LAST weight_num point sets, newest
        weighted highest (reference predict.py:18-26)."""
        from gen6d_tpu.cli.predict import weighted_pts
        pts = [np.full((8, 2), float(i)) for i in range(15)]
        w = np.exp(-(np.arange(10) / 10) ** 2)[::-1]
        expect = np.sum(np.arange(5, 15) * w) / np.sum(w)
        out = weighted_pts(pts, weight_num=10, std_inv=10)
        np.testing.assert_allclose(out, np.full((8, 2), expect), rtol=1e-6)

    def test_short_history(self):
        from gen6d_tpu.cli.predict import weighted_pts
        pts = [np.zeros((4, 2)), np.ones((4, 2))]
        w = np.exp(-(np.arange(10) / 10) ** 2)[::-1][-2:]
        expect = w[1] / w.sum()
        np.testing.assert_allclose(weighted_pts(pts), expect, rtol=1e-6)

    def test_pnp_smoothing_fixed_point(self, rng):
        """PnP on the projections of a pose recovers that pose (the smoothing
        re-solve is exact when the history is constant)."""
        import jax.numpy as jnp
        from gen6d_tpu.cli.predict import weighted_pts
        from gen6d_tpu.geometry.camera import project_points
        from gen6d_tpu.geometry.solvers import pnp_gauss_newton
        from gen6d_tpu.utils.draw import pts_range_to_bbox_pts

        bbox = pts_range_to_bbox_pts(np.ones(3) * 0.5, -np.ones(3) * 0.5)
        K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32)
        R, _ = np.linalg.qr(rng.randn(3, 3))
        if np.linalg.det(R) < 0:
            R[:, 0] *= -1
        pose = np.concatenate([R, [[0.1], [-0.05], [3.0]]], 1).astype(np.float32)
        pts, _ = project_points(jnp.asarray(bbox), jnp.asarray(pose),
                                jnp.asarray(K))
        sm = weighted_pts([np.asarray(pts)] * 6, weight_num=5, std_inv=2.5)
        pose_s = np.asarray(pnp_gauss_newton(
            jnp.asarray(bbox), jnp.asarray(sm, jnp.float32), jnp.asarray(K),
            jnp.asarray(pose)))
        np.testing.assert_allclose(pose_s, pose, atol=1e-3)


@pytest.mark.slow
def test_track_video_end_to_end(tmp_path, monkeypatch):
    """video file -> video2image -> per-frame tracking predict (pose_init
    chaining, refine_iter forced to 1) -> smoothing -> outputs on disk.
    Random weights: validates the workflow, not accuracy."""
    import cv2
    import jax
    import jax.numpy as jnp
    from gen6d_tpu.cli import predict as P
    from gen6d_tpu.data import database as dbm
    from gen6d_tpu.models.detector import Detector
    from gen6d_tpu.models.refiner import VolumeRefiner
    from gen6d_tpu.models.selector import ViewpointSelector
    from gen6d_tpu.pipeline.estimator import Gen6DEstimator

    db = dbm.parse_database_name('synthetic/12')
    video = str(tmp_path / 'in.avi')
    wr = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*'MJPG'), 10,
                         (128, 96))
    assert wr.isOpened()
    for i in range(6):
        img = db.get_image(db.get_img_ids()[i % 12])
        img = cv2.resize(img, (128, 96), interpolation=cv2.INTER_AREA)
        wr.write(cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    wr.release()

    key = jax.random.PRNGKey(0)
    det = Detector({'score_norm': 'adaptive', 'detection_scales': (-1.0, 0.0)})
    det_params = jax.jit(det.init)(key, jnp.zeros((2, 64, 64, 3)),
                                   jnp.zeros((1, 96, 128, 3)))
    sel = ViewpointSelector()
    poses0 = jnp.tile(jnp.eye(3, 4)[None], (3, 1, 1)).at[:, 2, 3].set(3.0)
    sel_params = jax.jit(sel.init)(key, jnp.zeros((5, 3, 128, 128, 3)), poses0,
                                   jnp.zeros(3), jnp.asarray([0.0, 0, 1]),
                                   jnp.zeros((1, 128, 128, 3)))
    refi = VolumeRefiner({'refiner_sample_num': 8})
    K0 = jnp.asarray([[300.0, 0, 64], [0, 300, 64], [0, 0, 1]])[None]
    p0 = jnp.eye(3, 4)[None].at[:, 2, 3].set(3.0)
    ref_params = jax.jit(refi.init)(key, jnp.zeros((1, 128, 128, 3)), K0, p0,
                                    jnp.zeros((1, 2, 128, 128, 3)),
                                    jnp.tile(p0[:, None], (1, 2, 1, 1)),
                                    jnp.tile(K0[:, None], (1, 2, 1, 1)))
    est = Gen6DEstimator(
        {'ref_view_num': 12, 'det_ref_view_num': 8, 'refine_iter': 1,
         'refine_even_num': 12, 'refine_ref_num': 2},
        detector=(det, det_params), selector=(sel, sel_params),
        refiner=(refi, ref_params))
    monkeypatch.setattr(P, 'load_estimator', lambda cfg: est)

    n = P.track_video(None, 'synthetic/12', video, str(tmp_path / 'out'),
                      interval=2, resolution=128, ffmpeg='ffmpeg-absent')
    assert n == 3
    for i in range(n):
        assert (tmp_path / 'out' / 'images_out' / f'{i}-bbox.jpg').exists()
        assert (tmp_path / 'out' / 'images_out_smooth' / f'{i}-bbox.jpg').exists()
        pose = np.load(tmp_path / 'out' / 'images_out' / f'{i}-pose.npy')
        assert pose.shape == (3, 4) and np.all(np.isfinite(pose))
