import pickle
import os
import struct
import tempfile

import numpy as np
import jax.numpy as jnp
import pytest

from gen6d_tpu.data import database as D
from gen6d_tpu.data import ref_prep as RP
from gen6d_tpu.data.ply import load_ply_vertices
from gen6d_tpu.data.colmap import read_model, rotmat2qvec, qvec2rotmat
from gen6d_tpu.data.synthetic import SyntheticScene, render_cube
from gen6d_tpu.geometry.camera import project_points


class TestSynthetic:
    def test_render_consistency(self):
        scene = SyntheticScene(n_views=8)
        img, mask = scene.render(0)
        assert img.shape == (480, 640, 3) and mask.sum() > 500
        # GT: projected cube corners bound the rendered mask
        corners = np.array([[x, y, z] for x in (-0.5, 0.5) for y in (-0.5, 0.5)
                            for z in (-0.5, 0.5)], np.float32)
        pts2d, _ = project_points(jnp.asarray(corners), jnp.asarray(scene.poses[0]),
                                  jnp.asarray(scene.K))
        pts2d = np.array(pts2d)
        ys, xs = np.nonzero(mask)
        assert xs.min() >= pts2d[:, 0].min() - 2 and xs.max() <= pts2d[:, 0].max() + 2
        assert ys.min() >= pts2d[:, 1].min() - 2 and ys.max() <= pts2d[:, 1].max() + 2

    def test_views_differ(self):
        scene = SyntheticScene(n_views=8)
        img0, _ = scene.render(0)
        img5, _ = scene.render(5)
        assert np.abs(img0.astype(int) - img5.astype(int)).mean() > 1


class TestDatabase:
    def test_synthetic_database(self):
        db = D.parse_database_name('synthetic/16')
        assert len(db.get_img_ids()) == 16
        assert db.get_image('0').shape == (480, 640, 3)
        assert D.get_diameter(db) == pytest.approx(np.sqrt(3))
        np.testing.assert_allclose(D.get_object_center(db), np.zeros(3))
        ref_ids, que_ids = D.get_database_split(db, 'synthetic_split')
        assert set(ref_ids).isdisjoint(que_ids)
        assert len(ref_ids) + len(que_ids) == 16

    def test_normalized_database(self):
        db = D.parse_database_name('synthetic/8')
        ndb = D.NormalizedDatabase(db)
        assert D.get_diameter(ndb) == 2.0
        # normalized pose projects scaled points identically (up to focal):
        pose = db.get_pose('0')
        npose = ndb.get_pose('0')
        pts = D.get_ref_point_cloud(db)[:10]
        npts = D.get_ref_point_cloud(ndb)[:10]
        a, _ = project_points(jnp.asarray(pts), jnp.asarray(pose), jnp.asarray(db.get_K('0')))
        b, _ = project_points(jnp.asarray(npts), jnp.asarray(npose), jnp.asarray(ndb.get_K('0')))
        np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-2)

    def test_normalize_denormalize_roundtrip(self):
        db = D.parse_database_name('synthetic/8')
        pose = db.get_pose('2')
        p2 = D.denormalize_pose(D.normalize_pose(pose, 0.7, np.array([0.1, 0.2, 0.3], np.float32)),
                                0.7, np.array([0.1, 0.2, 0.3], np.float32))
        np.testing.assert_allclose(p2, pose, atol=1e-5)


class TestPly:
    def test_binary_roundtrip(self, tmp_path):
        pts = np.random.RandomState(0).rand(17, 3).astype(np.float32)
        p = tmp_path / 'a.ply'
        with open(p, 'wb') as f:
            f.write(b'ply\nformat binary_little_endian 1.0\n')
            f.write(b'element vertex 17\n')
            f.write(b'property float x\nproperty float y\nproperty float z\n')
            f.write(b'end_header\n')
            f.write(pts.astype('<f4').tobytes())
        np.testing.assert_allclose(load_ply_vertices(str(p)), pts)

    def test_ascii(self, tmp_path):
        p = tmp_path / 'b.ply'
        with open(p, 'wb') as f:
            f.write(b'ply\nformat ascii 1.0\nelement vertex 2\n')
            f.write(b'property float x\nproperty float y\nproperty float z\n')
            f.write(b'end_header\n1 2 3\n4 5 6\n')
        np.testing.assert_allclose(load_ply_vertices(str(p)),
                                   [[1, 2, 3], [4, 5, 6]])


class TestColmap:
    def test_binary_model_roundtrip(self, tmp_path):
        # write a minimal COLMAP binary model and read it back
        with open(tmp_path / 'cameras.bin', 'wb') as f:
            f.write(struct.pack('<Q', 1))
            f.write(struct.pack('<iiQQ', 1, 2, 640, 480))  # SIMPLE_RADIAL
            f.write(struct.pack('<dddd', 500.0, 320.0, 240.0, 0.0))
        R = np.eye(3)
        q = rotmat2qvec(R)
        with open(tmp_path / 'images.bin', 'wb') as f:
            f.write(struct.pack('<Q', 1))
            f.write(struct.pack('<i', 1))
            f.write(struct.pack('<dddd', *q))
            f.write(struct.pack('<ddd', 0.1, 0.2, 3.0))
            f.write(struct.pack('<i', 1))
            f.write(b'0.jpg\x00')
            f.write(struct.pack('<Q', 0))
        with open(tmp_path / 'points3D.bin', 'wb') as f:
            f.write(struct.pack('<Q', 1))
            f.write(struct.pack('<Q', 7))
            f.write(struct.pack('<ddd', 1.0, 2.0, 3.0))
            f.write(struct.pack('<BBB', 10, 20, 30))
            f.write(struct.pack('<d', 0.5))
            f.write(struct.pack('<Q', 0))
        cams, imgs, pts = read_model(str(tmp_path))
        assert cams[1].K()[0, 0] == 500.0
        pose = imgs[1].pose()
        np.testing.assert_allclose(pose[:, :3], np.eye(3), atol=1e-6)
        np.testing.assert_allclose(pose[:, 3], [0.1, 0.2, 3.0], atol=1e-6)
        np.testing.assert_allclose(pts[0][0], [1, 2, 3])

    def test_qvec_roundtrip(self, rng):
        A = rng.randn(3, 3)
        Q, _ = np.linalg.qr(A)
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        np.testing.assert_allclose(qvec2rotmat(rotmat2qvec(Q)), Q, atol=1e-6)


class TestRefPrep:
    def test_normalized_views_center_object(self):
        """Warped reference crops must have the object centered and scaled to
        fill size*(1-margin) (database_utils.py:54-110 semantics)."""
        db = D.parse_database_name('synthetic/8')
        ids = db.get_img_ids()[:4]
        imgs, masks, poses, Ks = RP.gather_images(db, ids)
        size, margin = 128, 0.05
        out_imgs, out_masks, K_new, pose_new, Hs = RP.normalize_reference_views_device(
            jnp.asarray(imgs), jnp.asarray(masks), jnp.asarray(poses),
            jnp.asarray(Ks), jnp.asarray(db.scene.center),
            db.scene.diameter, size, margin,
            object_vert=jnp.asarray(db.scene.vert))
        out_masks = np.array(out_masks)
        for i in range(4):
            m = out_masks[i] > 0.5
            assert m.sum() > 100
            ys, xs = np.nonzero(m)
            cx, cy = xs.mean(), ys.mean()
            assert abs(cx - size / 2) < 8 and abs(cy - size / 2) < 8
            extent = max(xs.max() - xs.min(), ys.max() - ys.min())
            assert extent <= size  # fits
            assert extent > 0.3 * size  # and is reasonably large

        # the new K/pose project the object center to the crop center
        for i in range(4):
            cen, _ = project_points(jnp.zeros((1, 3)), pose_new[i], K_new[i])
            np.testing.assert_allclose(np.array(cen)[0], [size / 2, size / 2],
                                       atol=0.5)

    def test_vert_rectification_aligns_up(self):
        """With object_vert rectification the object's +z axis must point to
        image Y- in every crop."""
        db = D.parse_database_name('synthetic/8')
        ids = db.get_img_ids()[:4]
        imgs, masks, poses, Ks = RP.gather_images(db, ids)
        _, _, K_new, pose_new, _ = RP.normalize_reference_views_device(
            jnp.asarray(imgs), jnp.asarray(masks), jnp.asarray(poses),
            jnp.asarray(Ks), jnp.asarray(db.scene.center), db.scene.diameter,
            128, 0.05, object_vert=jnp.asarray(db.scene.vert))
        for i in range(4):
            c0, _ = project_points(jnp.asarray([[0, 0, 0.0]]), pose_new[i], K_new[i])
            c1, _ = project_points(jnp.asarray([[0, 0, 0.3]]), pose_new[i], K_new[i])
            d = np.array(c1 - c0)[0]
            # up in world should be up (-y) in the crop
            assert d[1] < 0
            assert abs(d[0]) < 0.3 * abs(d[1])

    def test_fps_selection(self):
        db = D.parse_database_name('synthetic/32')
        ids = RP.select_reference_img_ids_fps(db, db.get_img_ids(), 8)
        assert len(ids) == 8 and len(set(ids.tolist())) == 8


class TestColmapWriter:
    def test_model_round_trip(self, tmp_path):
        """write_model -> read_model recovers cameras/images/points exactly
        (reference utils/read_write_model.py:419-484 parity)."""
        from gen6d_tpu.data import colmap as C
        rng = np.random.RandomState(0)
        cams = {1: C.Camera(1, 'SIMPLE_RADIAL', 640, 480,
                            np.array([500.0, 320.0, 240.0, 0.01]))}
        imgs = {}
        for i in range(3):
            R, _ = np.linalg.qr(rng.randn(3, 3))
            if np.linalg.det(R) < 0:
                R[:, 0] *= -1
            q = C.rotmat2qvec(R)
            imgs[i + 1] = C.Image(i + 1, q, rng.randn(3), 1, f'img{i}.jpg')
        xyz = rng.randn(10, 3).astype(np.float32)
        rgb = rng.randint(0, 255, (10, 3)).astype(np.uint8)
        ids = np.arange(10, dtype=np.int64)
        C.write_model(cams, imgs, (xyz, rgb, ids), str(tmp_path))

        cams2, imgs2, pts2 = C.read_model(str(tmp_path))
        assert cams2[1].model == 'SIMPLE_RADIAL'
        np.testing.assert_allclose(cams2[1].params, cams[1].params)
        for i in imgs:
            np.testing.assert_allclose(imgs2[i].qvec, imgs[i].qvec, atol=1e-12)
            np.testing.assert_allclose(imgs2[i].tvec, imgs[i].tvec, atol=1e-12)
            assert imgs2[i].name == imgs[i].name
            np.testing.assert_allclose(imgs2[i].pose(), imgs[i].pose(),
                                       atol=1e-6)
        np.testing.assert_allclose(pts2[0], xyz, atol=1e-6)
        np.testing.assert_array_equal(pts2[1], rgb)


class TestEvalSplits:
    def test_synthetic_split_disjoint(self):
        """Regression for the eval reference-set leak: the ref and query
        halves of synthetic_split must not intersect, and eval must build
        references from the ref half (cli/eval.py ref_split selection)."""
        db = D.parse_database_name('synthetic/16')
        ref_ids, que_ids = D.get_database_split(db, 'synthetic_split')
        assert set(ref_ids).isdisjoint(que_ids)
        assert len(ref_ids) + len(que_ids) == len(db.get_img_ids())

    def test_eval_uses_ref_half(self):
        import inspect
        from gen6d_tpu.cli import eval as E
        src = inspect.getsource(E.evaluate)
        assert "'synthetic_split'" in src.split('ref_split =')[1].split('\n')[1] or \
               'synthetic_split' in src.split('ref_split =')[1][:200]


class TestTrainingDatabases:
    """GSO / ShapeNetRender database classes on fabricated fixture dirs in
    the reference's on-disk formats (dataset/database.py:412-549,600-665)."""

    def _make_gso(self, root, n=4):
        from gen6d_tpu.data.synthetic import SyntheticScene
        from PIL import Image
        scene = SyntheticScene(n_views=n, hw=(128, 128), f=140.0, dist=3.3)
        obj = root / 'google_scanned_objects' / 'toy'
        for sub in ('rgb', 'mask', 'depth', 'intrinsics', 'pose'):
            (obj / sub).mkdir(parents=True)
        K44 = np.eye(4)
        K44[:3, :3] = scene.K
        for i in range(n):
            img, mask = scene.render(i)
            Image.fromarray(img).save(obj / 'rgb' / f'{i:06}.png')
            Image.fromarray((mask * 255).astype(np.uint8)).save(
                obj / 'mask' / f'{i:06}.png')
            # constant depth at the object distance (mm), masked
            pose = scene.poses[i]
            cam = -pose[:3, :3].T @ pose[:3, 3]
            d_mm = np.zeros((128, 128), np.uint16)
            d_mm[mask] = int(np.linalg.norm(cam) * 1000)
            Image.fromarray(d_mm).save(obj / 'depth' / f'{i:06}.png')
            np.savetxt(obj / 'intrinsics' / f'{i:06}.txt', K44.reshape(-1))
            # on disk: camera-to-world
            c2w = np.eye(4)
            c2w[:3, :3] = pose[:3, :3].T
            c2w[:3, 3] = cam
            np.savetxt(obj / 'pose' / f'{i:06}.txt', c2w.reshape(-1))
        return scene

    def test_gso_database(self, tmp_path, monkeypatch):
        import gen6d_tpu.data.database as dbm
        scene = self._make_gso(tmp_path)
        monkeypatch.setattr(dbm, 'GSO_ROOT',
                            str(tmp_path / 'google_scanned_objects'))
        monkeypatch.setattr(dbm, 'DATA_ROOT', str(tmp_path))

        class FourViews(dbm.GoogleScannedObjectDatabase):
            def get_img_ids(self):
                return [str(i) for i in range(4)]

        db = FourViews('gso/toy/white_raw')
        img = db.get_image('0')
        assert img.shape == (128, 128, 3)
        assert db.get_mask('1').any()
        # world->camera pose round-trips the renderer's pose
        np.testing.assert_allclose(db.get_pose('2'), scene.poses[2], atol=1e-5)
        np.testing.assert_allclose(db.get_K('0'), scene.K, atol=1e-4)
        assert np.isfinite(db.object_diameter) and db.object_diameter > 0
        assert np.all(np.isfinite(db.object_center))
        # resized variant rescales K by resolution/512 (real GSO renders are
        # 512^2; the fixture is 128^2, so only the ratio semantics are checked)
        db64 = FourViews('gso/toy/black_64')
        assert db64.get_image('0').shape == (64, 64, 3)
        np.testing.assert_allclose(db64.get_K('0')[0, 0],
                                   scene.K[0, 0] * 64 / 512, rtol=1e-5)

    def test_shapenet_database(self, tmp_path, monkeypatch):
        import pickle
        import gen6d_tpu.data.database as dbm
        from gen6d_tpu.data.synthetic import SyntheticScene
        from PIL import Image
        scene = SyntheticScene(n_views=4, hw=(128, 128), f=140.0, dist=3.3)
        setting = 'evenly-4-128'
        obj = tmp_path / 'shapenet' / 'shapenet_render' / setting / 'cat' / 'm0'
        obj.mkdir(parents=True)
        for i in range(4):
            img, mask = scene.render(i)
            rgba = np.concatenate([img, (mask * 255).astype(np.uint8)[..., None]],
                                  -1)
            Image.fromarray(rgba).save(obj / f'{i}.png')
            with open(obj / f'{i}-camera.pkl', 'wb') as f:
                pickle.dump((scene.poses[i], scene.K), f)
        cache = tmp_path / 'shapenet' / 'shapenet_cache'
        cache.mkdir(parents=True)
        verts = scene.point_cloud
        with open(cache / f'cat-m0-{setting}-verts.pkl', 'wb') as f:
            pickle.dump([verts, verts.mean(0), float(scene.diameter)], f)
        monkeypatch.setattr(dbm, 'SHAPENET_RENDER_ROOT',
                            str(tmp_path / 'shapenet' / 'shapenet_render'))
        monkeypatch.setattr(dbm, 'DATA_ROOT', str(tmp_path))

        db = dbm.ShapeNetRenderDatabase(f'shapenet/cat/m0/{setting}')
        assert db.get_image('0').shape == (128, 128, 3)
        assert db.get_mask('1').any()
        np.testing.assert_allclose(db.get_pose('3'), scene.poses[3], atol=1e-6)
        assert dbm.get_diameter(db) > 0
        assert dbm.get_ref_point_cloud(db).shape[0] == verts.shape[0]


def _write_ascii_ply(path, pts):
    pts = np.asarray(pts, np.float32)
    with open(path, 'w') as f:
        f.write('ply\nformat ascii 1.0\n'
                f'element vertex {len(pts)}\n'
                'property float x\nproperty float y\nproperty float z\n'
                'end_header\n')
        for p in pts:
            f.write(f'{p[0]} {p[1]} {p[2]}\n')


def make_linemod_fixture(root, model_name='cat', n=8, hw=(128, 160)):
    """Fabricate a miniature LINEMOD on-disk tree (reference
    dataset/database.py:56-105 formats: JPEGImages/%06d.jpg, pose/pose%d.npy,
    mask/%04d.png, <obj>.ply, test.txt/train.txt, distance.txt)."""
    from gen6d_tpu.data.synthetic import SyntheticScene
    from PIL import Image
    scene = SyntheticScene(n_views=n, hw=hw, f=140.0, dist=3.3)
    obj = root / model_name
    for sub in ('JPEGImages', 'pose', 'mask'):
        (obj / sub).mkdir(parents=True)
    for i in range(n):
        img, mask = scene.render(i)
        Image.fromarray(img).save(obj / 'JPEGImages' / f'{i:06}.jpg')
        m = np.repeat((mask * 255).astype(np.uint8)[..., None], 3, -1)
        Image.fromarray(m).save(obj / 'mask' / f'{i:04}.png')
        np.save(obj / 'pose' / f'pose{i}.npy', scene.poses[i])
    _write_ascii_ply(obj / f'{model_name}.ply', scene.point_cloud)
    test_ids, train_ids = range(0, n, 2), range(1, n, 2)
    with open(obj / 'test.txt', 'w') as f:
        f.writelines(f'JPEGImages/{i:06}.jpg\n' for i in test_ids)
    with open(obj / 'train.txt', 'w') as f:
        f.writelines(f'JPEGImages/{i:06}.jpg\n' for i in train_ids)
    np.savetxt(obj / 'distance.txt', [scene.diameter * 100])
    return scene


class TestRealDataFixtures:
    """LINEMOD / GenMOP / Co3DResize database classes exercised on fabricated
    miniature on-disk trees in the reference formats (no real data ships in
    this environment; reference dataset/database.py:56-237,563-596)."""

    def test_linemod_database(self, tmp_path, monkeypatch):
        import gen6d_tpu.data.database as dbm
        scene = make_linemod_fixture(tmp_path / 'LINEMOD')
        monkeypatch.setattr(dbm, 'LINEMOD_ROOT', str(tmp_path / 'LINEMOD'))

        db = dbm.parse_database_name('linemod/cat')
        assert db.get_img_ids() == [str(i) for i in range(8)]
        assert db.get_image('0').shape == (128, 160, 3)
        assert db.get_mask('1').any()
        np.testing.assert_allclose(db.get_pose('2'), scene.poses[2], atol=1e-6)
        np.testing.assert_allclose(db.get_K('0'), dbm.LINEMODDatabase.K)
        # ply model loaded (cached as pkl on second load)
        assert db.model.shape == scene.point_cloud.shape
        db2 = dbm.parse_database_name('linemod/cat')
        np.testing.assert_allclose(db2.model, db.model)
        # splits: test.txt / train.txt / every-10th val
        ref_ids, que_ids = dbm.get_database_split(db, 'linemod_test')
        assert que_ids == ['0', '2', '4', '6'] and ref_ids == ['1', '3', '5', '7']
        _, val_ids = dbm.get_database_split(db, 'linemod_val')
        assert val_ids == que_ids[::10]
        np.testing.assert_allclose(dbm.get_diameter(db), scene.diameter,
                                   rtol=1e-5)
        np.testing.assert_allclose(dbm.get_ref_point_cloud(db), db.model)
        assert dbm.get_object_center(db).shape == (3,)

    def _make_genmop(self, root, obj='cup', n=6):
        from gen6d_tpu.data import colmap as C
        from gen6d_tpu.data.synthetic import SyntheticScene
        from PIL import Image
        rng = np.random.RandomState(5)
        scene = SyntheticScene(n_views=n, hw=(120, 160), f=150.0, dist=3.2)
        seqs = {}
        for kind in ('ref', 'test'):
            seq = root / f'{obj}-{kind}'
            (seq / 'images').mkdir(parents=True)
            img_fns = []
            cams, imgs = {}, {}
            for i in range(n):
                img, _ = scene.render(i)
                fn = f'{i}.jpg'
                Image.fromarray(img).save(seq / 'images' / fn)
                img_fns.append(fn)
                pose = scene.poses[i]
                cams[i + 1] = C.Camera(i + 1, 'SIMPLE_PINHOLE', 160, 120,
                                       np.asarray([150.0, 80.0, 60.0]))
                imgs[i + 1] = C.Image(i + 1, C.rotmat2qvec(pose[:3, :3]),
                                      pose[:3, 3].copy(), i + 1, fn)
            sparse = (seq / 'colmap-all' / 'colmap_default-colmap_default'
                      / 'sparse' / '0')
            C.write_model(cams, imgs, None, str(sparse))
            with open(seq / 'images_fn_cache.pkl', 'wb') as f:
                pickle.dump(img_fns, f)
            seqs[kind] = seq
        _write_ascii_ply(seqs['ref'] / 'object_point_cloud.ply',
                         rng.uniform(-0.4, 0.4, (64, 3)))
        # test-sequence alignment: scale + rigid transfer pose (align.pkl)
        transfer = np.concatenate(
            [np.eye(3), np.asarray([[0.1], [0.0], [-0.2]])], 1)
        with open(seqs['test'] / 'align.pkl', 'wb') as f:
            pickle.dump((1.5, transfer), f)
        return scene, transfer

    def test_genmop_database(self, tmp_path, monkeypatch):
        import gen6d_tpu.data.database as dbm
        scene, transfer = self._make_genmop(tmp_path / 'GenMOP')
        monkeypatch.setattr(dbm, 'GENMOP_ROOT', str(tmp_path / 'GenMOP'))

        db = dbm.parse_database_name('genmop/cup-ref')
        assert db.get_img_ids() == [str(i) for i in range(6)]
        assert db.get_image('0').shape == (120, 160, 3)
        K = db.get_K('0')
        np.testing.assert_allclose(
            K, [[150, 0, 80], [0, 150, 60], [0, 0, 1]], atol=1e-5)
        # poses = gravity-normalized COLMAP poses
        meta = db.meta_info
        expect = meta.normalize_pose(scene.poses[3])
        np.testing.assert_allclose(db.get_pose('3'), expect, atol=1e-4)
        np.testing.assert_allclose(dbm.get_diameter(db), 2.0)
        assert dbm.get_ref_point_cloud(db).shape == (64, 3)

        # test sequence composes align.pkl scale+transfer before normalizing
        dbt = dbm.parse_database_name('genmop/cup-test')
        raw = dbm.pose_compose_np(transfer, scene.poses[1])
        raw[:, 3:] *= 1.5
        np.testing.assert_allclose(dbt.get_pose('1'),
                                   meta.normalize_pose(raw), atol=1e-4)

    def test_co3d_resize_database(self, tmp_path, monkeypatch):
        import gen6d_tpu.data.database as dbm
        from gen6d_tpu.data.synthetic import SyntheticScene
        from PIL import Image
        scene = SyntheticScene(n_views=4, hw=(128, 128), f=140.0, dist=3.3)
        root = tmp_path / 'co3d_128_256' / 'toaster' / 'seq1'
        (root / 'images').mkdir(parents=True)
        (root / 'masks').mkdir()
        ids = [str(i) for i in range(4)]
        Ks = {i: scene.K.copy() for i in ids}
        poses = {i: scene.poses[int(i)] for i in ids}
        ratios = {i: 1.0 for i in ids}
        for i in ids:
            img, mask = scene.render(int(i))
            Image.fromarray(img).save(root / 'images' / f'{i}.jpg')
            Image.fromarray((mask * 255).astype(np.uint8)).save(
                root / 'masks' / f'{i}.png')
        with open(root / 'info.pkl', 'wb') as f:
            pickle.dump((Ks, poses, ids, ratios), f)
        monkeypatch.setattr(dbm, 'CO3D_ROOT', str(tmp_path / 'co3d'))

        db = dbm.parse_database_name('co3d_resize/toaster/seq1/128_256')
        assert db.get_img_ids() == ids
        assert db.get_image('0').shape == (128, 128, 3)
        assert db.get_mask('2').any()
        np.testing.assert_allclose(db.get_pose('1'), scene.poses[1], atol=1e-6)
        np.testing.assert_allclose(db.get_K('0'), scene.K, atol=1e-5)
        # missing preprocessed crops raise (reference database.py:570-577)
        with pytest.raises(FileNotFoundError):
            dbm.parse_database_name('co3d_resize/toaster/seq1/64_128')
