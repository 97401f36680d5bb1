"""End-to-end eval through the GenMOP on-disk code path (slow tier).

Counterpart of test_linemod_e2e for the other headline benchmark format
(reference dataset/database.py:109-237): COLMAP binary sparse models per
sequence, the test->ref align.pkl gauge transfer, gravity/forward meta
normalization, and cli/eval's ref-seq-vs-test-seq evaluation flow."""
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NAME = 'pytestobj'


@pytest.fixture(scope='module')
def genmop_dir():
    root = os.path.join(REPO, 'data', 'GenMOP')
    marker = os.path.join(root, f'{NAME}-test', 'align.pkl')
    if not os.path.exists(marker):
        # the generator self-checks reprojection consistency to <0.1px
        subprocess.run(
            [sys.executable, 'scripts/make_genmop_synthetic.py',
             '--name', NAME, '--n_ref', '24', '--n_test', '8', '--seed', '5'],
            cwd=REPO, check=True)
    return root


def test_genmop_database_disk_path(genmop_dir):
    from gen6d_tpu.data import database as D
    ref = D.parse_database_name(f'genmop/{NAME}-ref')
    que = D.parse_database_name(f'genmop/{NAME}-test')
    assert isinstance(ref, D.GenMOPDatabase)
    assert len(ref.get_img_ids()) == 24 and len(que.get_img_ids()) == 8
    img = que.get_image(que.get_img_ids()[3])
    assert img.shape == (480, 640, 3) and img.dtype == np.uint8
    assert que.get_K(que.get_img_ids()[0]).shape == (3, 3)
    # gravity-normalized object: bbox diagonal == diameter convention 2.0
    pc = D.get_ref_point_cloud(ref)
    diag = float(np.linalg.norm(pc.max(0) - pc.min(0)))
    assert diag == pytest.approx(2.0, abs=1e-3)
    assert D.get_diameter(ref) == 2.0
    # test-seq poses are in the REF SfM frame (align.pkl applied): both
    # sequences must place the object at the same normalized center
    centers = []
    for db in (ref, que):
        cs = [-db.get_pose(i)[:, :3].T @ db.get_pose(i)[:, 3]
              for i in db.get_img_ids()]
        # camera positions orbit the object center: their mean approximates it
        centers.append(np.mean(cs, 0))
    assert np.linalg.norm(centers[0] - centers[1]) < 0.3


def test_genmop_eval_end_to_end(genmop_dir, tmp_path):
    """Full pipeline ref-seq -> test-seq through the disk format (random
    weights — validates the code path, not accuracy)."""
    import jax
    import jax.numpy as jnp
    from gen6d_tpu.cli.eval import evaluate
    from gen6d_tpu.models.detector import Detector
    from gen6d_tpu.models.refiner import VolumeRefiner
    from gen6d_tpu.models.selector import ViewpointSelector
    from gen6d_tpu.pipeline.estimator import Gen6DEstimator

    key = jax.random.PRNGKey(0)
    det = Detector({'score_norm': 'adaptive',
                    'detection_scales': (-1.0, 0.0)})
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

    results = evaluate(None, f'genmop/{NAME}', batch=2, max_queries=2,
                       output_root=str(tmp_path), estimator=est)
    assert set(results) >= {'add-0.1d', 'prj-5', 'poses_per_sec'}
    with open(os.path.join(REPO, 'data', 'performance.log')) as f:
        assert f'genmop/{NAME}' in f.read()


def test_compute_align_poses_recovers_gauge(genmop_dir, tmp_path):
    """The keypoint-annotation alignment workflow (cli/compute_align_poses,
    reference compute_align_poses.py:54-109) must recover the known test->ref
    gauge transfer of the synthetic object: synthesize 4-keypoint .fad
    annotations on 2+2 frames by projecting known 3D points through the RAW
    COLMAP poses, run align(), compare to the generator's analytic align.pkl."""
    import pickle
    from gen6d_tpu.cli.compute_align_poses import (GenMOPCOLMAPDatabase, align)

    ref_db = GenMOPCOLMAPDatabase(f'genmop/{NAME}-ref')
    test_db = GenMOPCOLMAPDatabase(f'genmop/{NAME}-test')
    with open(os.path.join(genmop_dir, f'{NAME}-test', 'align.pkl'),
              'rb') as f:
        scale_gt, transfer_gt = pickle.load(f)

    anno_dir = tmp_path / 'anno'
    anno_dir.mkdir()

    def write_fad(path, kps):
        pts = ''.join(f'<p x="{int(round(u))}" y="{int(round(v))}"/>'
                      for u, v in kps)
        path.write_text(f'<r><a><b><c>{pts}</c></b></a></r>')

    # 4 well-separated physical points, fixed in the REF SfM frame; the same
    # points in the TEST SfM frame via the frame map implied by align.pkl:
    # x_test = (1/scale_gt) * R_tr @ x_ref + t_tr
    pts_ref = np.random.RandomState(7).randn(4, 3) * 0.4
    pts_test = (1.0 / scale_gt) * pts_ref @ transfer_gt[:, :3].T \
        + transfer_gt[:, 3]
    for kind, db, pts, ids in (('ref', ref_db, pts_ref, ('0', '5')),
                               ('test', test_db, pts_test, ('0', '3'))):
        for img_id in ids:
            pose, K = db.get_pose(img_id), db.get_K(img_id)
            cam = pts @ pose[:, :3].T + pose[:, 3]
            uv = cam @ K.T
            uv = uv[:, :2] / uv[:, 2:]
            write_fad(anno_dir / f'{kind}-{img_id}-kp.fad', uv)

    scale_pr, transfer_pr = align(ref_db, test_db, str(anno_dir))
    assert scale_pr == pytest.approx(scale_gt, rel=0.02)
    np.testing.assert_allclose(transfer_pr[:, :3], transfer_gt[:, :3],
                               atol=0.05)
    np.testing.assert_allclose(transfer_pr[:, 3], transfer_gt[:, 3], atol=0.08)
