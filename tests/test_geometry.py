import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gen6d_tpu.geometry import rotations as rot
from gen6d_tpu.geometry import transform2d as t2d
from gen6d_tpu.geometry import pose as P
from gen6d_tpu.geometry import camera as cam
from gen6d_tpu.geometry import solvers
from gen6d_tpu.geometry import metrics as gmetrics
from gen6d_tpu.geometry.fps import sample_fps_points


def random_rotation(rng):
    A = rng.randn(3, 3)
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q.astype(np.float32)


def random_pose(rng, dist=3.0):
    R = random_rotation(rng)
    t = rng.randn(3).astype(np.float32)
    t[2] = dist + rng.rand()
    return np.concatenate([R, t[:, None]], 1).astype(np.float32)


def look_at_pose(cam_pos, target, up=(0, 0, 1)):
    """Standard look-at world->camera pose (independent construction for tests)."""
    z = np.asarray(target, np.float64) - np.asarray(cam_pos, np.float64)
    z /= np.linalg.norm(z)
    x = np.cross(z, np.asarray(up, np.float64))
    if np.linalg.norm(x) < 1e-6:
        x = np.cross(z, np.asarray([0.0, 1.0, 0.0]))
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z], 0)
    t = -R @ np.asarray(cam_pos, np.float64)
    return np.concatenate([R, t[:, None]], 1).astype(np.float32)


class TestRotations:
    def test_rot_xyz_orthonormal(self, rng):
        for f in (rot.rot_x, rot.rot_y, rot.rot_z):
            R = np.array(f(0.7))
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
            assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-6)

    def test_quat_roundtrip(self, rng):
        for _ in range(50):
            R = random_rotation(rng)
            q = rot.mat_to_quat(jnp.asarray(R))
            R2 = rot.quat_to_mat(q)
            np.testing.assert_allclose(np.array(R2), R, atol=1e-5)

    def test_quat_apply_matches_matrix(self, rng):
        R = random_rotation(rng)
        q = rot.mat_to_quat(jnp.asarray(R))
        pts = rng.randn(10, 3).astype(np.float32)
        np.testing.assert_allclose(np.array(rot.quat_apply(q, pts)),
                                   pts @ R.T, atol=1e-5)

    def test_inplane_angle_szyx(self, rng):
        a, b, c = 0.3, 0.2, -0.4
        R = np.array(rot.rot_x(c) @ rot.rot_y(b) @ rot.rot_z(a))
        assert float(rot.inplane_angle_szyx(jnp.asarray(R))) == pytest.approx(a, abs=1e-6)

    def test_look_at_rotation_centers_point(self):
        # for points on an axis, the rectified direction must align with +z exactly
        for p in ([0.3, 0.0], [0.0, -0.2], [0.0, 0.0]):
            R = np.array(rot.look_at_rotation(jnp.asarray(p)))
            d = R @ np.array([p[0], p[1], 1.0])
            d /= np.linalg.norm(d)
            np.testing.assert_allclose(d, [0, 0, 1], atol=1e-6)

    def test_rotation_angle(self, rng):
        axis = np.array([0.0, 0.0, 1.0])
        ang = 0.9
        R = np.array(rot.rot_z(ang))
        assert float(rot.rotation_angle(jnp.asarray(R))) == pytest.approx(ang, abs=1e-5)


class TestTransform2d:
    def test_compose_apply(self, rng):
        M0 = t2d.rotation_2d(0.5)
        M1 = t2d.offset_2d(2.0, -1.0)
        M = t2d.compose_2d(M0, M1)
        pts = jnp.asarray(rng.randn(7, 2).astype(np.float32))
        out1 = t2d.apply_2d(M, pts)
        out2 = t2d.apply_2d(M1, t2d.apply_2d(M0, pts))
        np.testing.assert_allclose(np.array(out1), np.array(out2), atol=1e-5)

    def test_inverse(self, rng):
        M = t2d.compose_2d(t2d.compose_2d(t2d.scale_2d(1.7), t2d.rotation_2d(-0.3)),
                           t2d.offset_2d(3.0, 4.0))
        Mi = t2d.inverse_2d(M)
        pts = jnp.asarray(rng.randn(5, 2).astype(np.float32))
        np.testing.assert_allclose(np.array(t2d.apply_2d(Mi, t2d.apply_2d(M, pts))),
                                   np.array(pts), atol=1e-4)

    def test_decompose(self):
        s, a = 2.0, 0.7
        M = t2d.compose_2d(t2d.compose_2d(t2d.scale_2d(s), t2d.rotation_2d(a)),
                           t2d.offset_2d(1.0, 2.0))
        scale, angle, offset = t2d.decompose_2d(M)
        assert float(scale) == pytest.approx(s, abs=1e-5)
        assert float(angle) == pytest.approx(a, abs=1e-5)
        np.testing.assert_allclose(np.array(offset), [1.0, 2.0], atol=1e-5)

    def test_crop_transform_center_maps_to_half_size(self):
        M = t2d.crop_transform_2d(jnp.asarray([10.0, 20.0]), 2.0, 0.3, 128)
        out = t2d.apply_2d(M, jnp.asarray([[10.0, 20.0]]))
        np.testing.assert_allclose(np.array(out)[0], [64.0, 64.0], atol=1e-5)


class TestPose:
    def test_inverse_compose(self, rng):
        p = jnp.asarray(random_pose(rng))
        pi = P.pose_inverse(p)
        ident = P.pose_compose(p, pi)
        np.testing.assert_allclose(np.array(ident), np.array(P.identity_pose()), atol=1e-5)

    def test_apply_matches_manual(self, rng):
        p = random_pose(rng)
        pts = rng.randn(6, 3).astype(np.float32)
        np.testing.assert_allclose(np.array(P.pose_apply(jnp.asarray(p), jnp.asarray(pts))),
                                   pts @ p[:, :3].T + p[:, 3], atol=1e-5)

    def test_normalize_roundtrip(self, rng):
        p = random_pose(rng)
        scale, offset = 0.37, jnp.asarray([0.1, -0.2, 0.3])
        pn = P.normalize_pose(jnp.asarray(p), scale, offset)
        pd = P.denormalize_pose(pn, scale, offset)
        np.testing.assert_allclose(np.array(pd), p, atol=1e-5)

    def test_normalize_semantics(self, rng):
        # x_obj_new = x_obj*scale + offset  =>  projecting scaled points with the
        # normalized pose equals projecting raw points with the raw pose
        p = random_pose(rng)
        scale, offset = 0.5, np.array([0.3, 0.1, -0.2], np.float32)
        pts = rng.randn(5, 3).astype(np.float32)
        pts_new = pts * scale + offset
        pn = P.normalize_pose(jnp.asarray(p), scale, jnp.asarray(offset))
        a = P.pose_apply(pn, jnp.asarray(pts_new))
        b = scale * np.array(P.pose_apply(jnp.asarray(p), jnp.asarray(pts)))
        np.testing.assert_allclose(np.array(a), b, atol=1e-4)

    def test_camera_position(self, rng):
        pos = np.array([1.0, 2.0, 3.0])
        p = look_at_pose(pos, [0, 0, 0])
        np.testing.assert_allclose(np.array(P.camera_position(jnp.asarray(p))), pos,
                                   atol=1e-5)


class TestCamera:
    K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32)

    def test_project_points(self, rng):
        p = look_at_pose([0, 0, -3], [0, 0, 0])
        pts = (rng.rand(20, 3).astype(np.float32) - 0.5)
        pts2d, dpt = cam.project_points(jnp.asarray(pts), jnp.asarray(p), jnp.asarray(self.K))
        c = pts @ p[:, :3].T + p[:, 3]
        expected = (c @ self.K.T)
        expected = expected[:, :2] / expected[:, 2:]
        np.testing.assert_allclose(np.array(pts2d), expected, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.array(dpt), c[:, 2], rtol=1e-5)

    def test_let_me_look_at_centers_principal_point(self):
        # rectifying at the principal point must be identity rotation, f unchanged
        R, f = cam.let_me_look_at_2d(jnp.asarray([320.0, 240.0]), jnp.asarray(self.K))
        np.testing.assert_allclose(np.array(R), np.eye(3), atol=1e-6)
        assert float(f) == pytest.approx(500.0, abs=1e-3)

    def test_view_correlation(self):
        p0 = look_at_pose([0, 0, -3], [0, 0, 0])
        p1 = look_at_pose([0, 0.01, 3], [0, 0, 0])
        corr = cam.view_correlation(jnp.asarray(p0[None]), jnp.asarray(np.stack([p0, p1])),
                                    jnp.zeros(3))
        assert float(corr[0, 0]) == pytest.approx(1.0, abs=1e-5)
        assert float(corr[0, 1]) == pytest.approx(-1.0, abs=1e-3)


class TestSolvers:
    K = np.array([[500.0, 0, 64], [0, 500, 64], [0, 0, 1]], np.float32)

    def test_pose_from_similarity_identity(self):
        """A query identical to the reference with unit similarity must recover
        the reference pose."""
        center = np.zeros(3, np.float32)
        ref_pose = look_at_pose([0, 0, -3], [0, 0, 0])
        pos, _ = cam.project_points(jnp.asarray(center[None]), jnp.asarray(ref_pose),
                                    jnp.asarray(self.K))
        pose_pr = solvers.estimate_pose_from_similarity_transform_compose(
            pos[0], jnp.asarray(1.0), jnp.asarray(0.0),
            jnp.asarray(ref_pose), jnp.asarray(self.K), jnp.asarray(self.K),
            jnp.asarray(center))
        np.testing.assert_allclose(np.array(pose_pr), ref_pose, atol=1e-3)

    def test_pose_from_similarity_scale_and_rotation(self):
        """Scaling by s moves the camera to distance d/s; in-plane rotation
        rotates the pose about the view axis."""
        center = np.zeros(3, np.float32)
        ref_pose = look_at_pose([0, 0, -3], [0, 0, 0])
        pos, _ = cam.project_points(jnp.asarray(center[None]), jnp.asarray(ref_pose),
                                    jnp.asarray(self.K))
        s, ang = 1.5, 0.4
        pose_pr = np.array(solvers.estimate_pose_from_similarity_transform_compose(
            pos[0], jnp.asarray(s), jnp.asarray(ang),
            jnp.asarray(ref_pose), jnp.asarray(self.K), jnp.asarray(self.K),
            jnp.asarray(center)))
        cam_pos = -pose_pr[:, :3].T @ pose_pr[:, 3]
        assert np.linalg.norm(cam_pos) == pytest.approx(3.0 / s, rel=1e-3)
        # in-plane rotation: relative rotation between pr and ref is about z (view axis)
        rel = pose_pr[:, :3] @ ref_pose[:, :3].T
        assert float(rot.inplane_angle_szyx(jnp.asarray(rel))) == pytest.approx(ang, abs=1e-3)

    def test_round_trip_with_scale_rotation_difference(self):
        """GT (scale, angle) from two camera poses must reproduce the query pose
        through the full detection->selection->solve composition."""
        center = np.zeros(3, np.float32)
        # same viewing direction (the solver assumes the selected reference view
        # shares the query viewpoint); distance differs by 1/0.8
        ref_pose = look_at_pose([0.2, 0.1, -3], [0, 0, 0])
        que_pose = look_at_pose([0.16, 0.08, -2.4], [0, 0, 0])
        scale, angle = solvers.scale_rotation_difference_from_cameras(
            jnp.asarray(ref_pose[None]), jnp.asarray(que_pose[None]),
            jnp.asarray(self.K[None]), jnp.asarray(self.K[None]), jnp.asarray(center))
        pos, _ = cam.project_points(jnp.asarray(center[None]), jnp.asarray(que_pose),
                                    jnp.asarray(self.K))
        pose_pr = np.array(solvers.estimate_pose_from_similarity_transform_compose(
            pos[0], scale[0], angle[0], jnp.asarray(ref_pose),
            jnp.asarray(self.K), jnp.asarray(self.K), jnp.asarray(center)))
        # rotation close
        ang_err = float(rot.rotation_angle(jnp.asarray(pose_pr[:, :3] @ que_pose[:, :3].T)))
        assert ang_err < 0.02
        cam_pr = -pose_pr[:, :3].T @ pose_pr[:, 3]
        cam_gt = -que_pose[:, :3].T @ que_pose[:, 3]
        assert np.linalg.norm(cam_pr - cam_gt) < 0.05

    def test_round_trip_off_axis_viewpoint(self):
        """With a small out-of-plane viewpoint difference the solver error is
        bounded by that viewpoint difference (it gets fixed by refinement)."""
        center = np.zeros(3, np.float32)
        ref_pose = look_at_pose([0.2, 0.1, -3], [0, 0, 0])
        que_pose = look_at_pose([0.25, 0.12, -2.4], [0, 0, 0])
        scale, angle = solvers.scale_rotation_difference_from_cameras(
            jnp.asarray(ref_pose[None]), jnp.asarray(que_pose[None]),
            jnp.asarray(self.K[None]), jnp.asarray(self.K[None]), jnp.asarray(center))
        pos, _ = cam.project_points(jnp.asarray(center[None]), jnp.asarray(que_pose),
                                    jnp.asarray(self.K))
        pose_pr = np.array(solvers.estimate_pose_from_similarity_transform_compose(
            pos[0], scale[0], angle[0], jnp.asarray(ref_pose),
            jnp.asarray(self.K), jnp.asarray(self.K), jnp.asarray(center)))
        ang_err = float(rot.rotation_angle(jnp.asarray(pose_pr[:, :3] @ que_pose[:, :3].T)))
        assert ang_err < 0.1

    def test_sim_rigid_identity(self):
        center = np.zeros(3, np.float32)
        in_pose = look_at_pose([0.3, -0.2, -2.5], [0, 0, 0])
        quat = jnp.asarray([1.0, 0, 0, 0])
        sim = solvers.compose_sim_pose(jnp.asarray(1.0), quat, jnp.zeros(2),
                                       jnp.asarray(in_pose), jnp.asarray(center))
        np.testing.assert_allclose(np.array(sim), np.array(P.identity_pose()), atol=1e-5)
        rigid = solvers.pose_sim_to_pose_rigid(sim, jnp.asarray(in_pose),
                                               jnp.asarray(self.K), jnp.asarray(self.K),
                                               jnp.asarray(center))
        np.testing.assert_allclose(np.array(rigid), in_pose, atol=1e-4)

    def test_similarity_transform_2pts(self, rng):
        s, a = 1.3, 0.6
        R = np.array(rot.angle_to_rotation_2d(jnp.asarray(a)))
        t = np.array([2.0, -1.0])
        p0 = rng.randn(1, 10, 2).astype(np.float32)
        p1 = s * p0 @ R.T + t
        scale, rotation, offset = solvers.similarity_transform_2pts(
            jnp.asarray(p0), jnp.asarray(p1))
        assert float(scale[0, 0, 0]) == pytest.approx(s, rel=1e-4)
        np.testing.assert_allclose(np.array(rotation[0]), R, atol=1e-4)
        np.testing.assert_allclose(np.array(offset[0, :, 0]), t, atol=1e-3)

    def test_ransac_similarity(self, rng):
        s, a = 0.8, -0.5
        R = np.array(rot.angle_to_rotation_2d(jnp.asarray(a)))
        t = np.array([5.0, 3.0])
        n = 200
        p0 = rng.rand(n, 2).astype(np.float32) * 100
        p1 = s * p0 @ R.T + t
        # 30% outliers
        out = rng.rand(n) < 0.3
        p1[out] += rng.randn(out.sum(), 2) * 50 + 40
        corr = np.concatenate([p0, p1], 1)
        key = jax.random.PRNGKey(0)
        s_pr, R_pr, t_pr, mask = solvers.ransac_similarity_transform(
            jnp.asarray(corr), key, iters=1024)
        assert float(s_pr) == pytest.approx(s, rel=0.02)
        np.testing.assert_allclose(np.array(R_pr), R, atol=0.02)
        np.testing.assert_allclose(np.array(t_pr), t, atol=1.5)

    def test_pnp_gauss_newton(self, rng):
        pose_gt = look_at_pose([0.4, 0.3, -3], [0, 0, 0])
        pts3d = (rng.rand(30, 3).astype(np.float32) - 0.5)
        pts2d, _ = cam.project_points(jnp.asarray(pts3d), jnp.asarray(pose_gt),
                                      jnp.asarray(self.K))
        # perturb init
        perturb = np.array(rot.rot_z(0.05))
        pose_init = pose_gt.copy()
        pose_init[:, :3] = perturb @ pose_init[:, :3]
        pose_init[:, 3] += 0.05
        pose_pr = np.array(solvers.pnp_gauss_newton(jnp.asarray(pts3d), pts2d,
                                                    jnp.asarray(self.K),
                                                    jnp.asarray(pose_init)))
        ang = float(rot.rotation_angle(jnp.asarray(pose_pr[:, :3] @ pose_gt[:, :3].T)))
        assert ang < 1e-3
        np.testing.assert_allclose(pose_pr[:, 3], pose_gt[:, 3], atol=1e-3)


class TestMetrics:
    K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32)

    def test_perfect_pose(self, rng):
        pts = rng.rand(100, 3).astype(np.float32) - 0.5
        pose = look_at_pose([0, 0, -3], [0, 0, 0])
        r = gmetrics.compute_metrics(pts, 1.0, pose[None], pose[None], self.K[None],
                                     symmetric=True)
        assert r['add-0.1d'] == 1.0 and r['prj-5'] == 1.0 and r['add-0.1d-sym'] == 1.0

    def test_bad_pose(self, rng):
        pts = rng.rand(100, 3).astype(np.float32) - 0.5
        pose = look_at_pose([0, 0, -3], [0, 0, 0])
        bad = pose.copy()
        bad[:, 3] += 1.0
        r = gmetrics.compute_metrics(pts, 1.0, pose[None], bad[None], self.K[None])
        assert r['add-0.1d'] == 0.0 and r['prj-5'] == 0.0

    def test_auc_monotone(self):
        errs = np.linspace(0, 10, 101)
        a5, a10 = gmetrics.compute_auc(errs, [5, 10])
        assert 0 < a5 < a10 < 1


class TestFPS:
    def test_fps_spreads(self, rng):
        pts = rng.randn(200, 3)
        idx = sample_fps_points(pts, 9, init_center=True, index_model=True)
        assert len(idx) == 8  # init_center consumes one slot (reference semantics)
        assert len(set(idx.tolist())) == 8
        # fps points should be more spread than random ones
        sel = pts[idx]
        d_fps = np.min([np.linalg.norm(sel[i] - np.delete(sel, i, 0), axis=1).min()
                        for i in range(len(sel))])
        rand = pts[rng.choice(200, 8, replace=False)]
        d_rand = np.min([np.linalg.norm(rand[i] - np.delete(rand, i, 0), axis=1).min()
                         for i in range(len(rand))])
        assert d_fps >= d_rand
