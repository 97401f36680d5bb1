"""End-to-end eval through the LINEMOD on-disk code path (slow tier).

VERDICT r3 item 5: the LINEMOD database classes were only ever
fixture-tested. This renders a full-size LINEMOD-format object to disk
(JPEGImages/%06d.jpg at 480x640, pose/pose{i}.npy, mask/%04d.png, .ply,
train/test splits — reference dataset/database.py:56-105) and runs
cli/eval.evaluate over it: real file IO, the native JPEG decoder, split
parsing, metric computation, and the performance.log line."""
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NAME = 'pytest_synthcube'


@pytest.fixture(scope='module')
def linemod_dir():
    root = os.path.join(REPO, 'data', 'LINEMOD', NAME)
    marker = os.path.join(root, 'distance.txt')
    if not os.path.exists(marker):
        subprocess.run(
            [sys.executable, 'scripts/make_linemod_synthetic.py',
             '--name', NAME, '--n_views', '48', '--seed', '3'],
            cwd=REPO, check=True)
    return root


def test_linemod_database_disk_path(linemod_dir):
    from gen6d_tpu.data import database as D
    db = D.parse_database_name(f'linemod/{NAME}')
    assert isinstance(db, D.LINEMODDatabase)
    ids = db.get_img_ids()
    assert len(ids) == 48
    img = db.get_image(ids[5])
    assert img.shape == (480, 640, 3) and img.dtype == np.uint8
    mask = db.get_mask(ids[5])
    assert mask.shape == (480, 640) and mask.sum() > 1000
    pose = db.get_pose(ids[5])
    assert pose.shape == (3, 4)
    assert db.model.shape[1] == 3
    assert 1.0 < D.get_diameter(db) < 3.0
    ref_ids, que_ids = D.get_database_split(db, 'linemod_test')
    assert len(ref_ids) == 36 and len(que_ids) == 12
    assert not set(ref_ids) & set(que_ids)


def test_linemod_eval_end_to_end(linemod_dir, tmp_path):
    """Full pipeline over the disk-format object: build from the train split,
    predict the test split, metrics + performance.log (random weights — this
    validates the code path, not accuracy)."""
    import jax
    from gen6d_tpu.cli.eval import evaluate
    from gen6d_tpu.models.detector import Detector
    from gen6d_tpu.models.refiner import VolumeRefiner
    from gen6d_tpu.models.selector import ViewpointSelector
    from gen6d_tpu.pipeline.estimator import Gen6DEstimator
    import jax.numpy as jnp

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

    results = evaluate(None, f'linemod/{NAME}', batch=2, max_queries=2,
                       output_root=str(tmp_path), estimator=est)
    assert set(results) >= {'add-0.1d', 'prj-5', 'poses_per_sec'}
    with open(os.path.join(REPO, 'data', 'performance.log')) as f:
        assert f'linemod/{NAME}' in f.read()
