"""End-to-end throughput benchmark: poses/sec/chip for the full
detect -> crop -> select -> solve -> refine x3 pipeline.

Runs on the synthetic textured-cube scene at LINEMOD geometry (480x640 queries,
64 reference views x 5 angles, 32 detector refs, 32^3 refine volume, 6 refine
refs) — the gen6d_pretrain operating point (configs/gen6d_pretrain.yaml; see
BASELINE.md). Network weights are random (no pretrained checkpoints in this
environment); throughput is weight-independent.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is poses/sec against the 30 poses/sec/chip north star.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from gen6d_tpu.data import database as D
    from gen6d_tpu.models.detector import Detector
    from gen6d_tpu.models.refiner import VolumeRefiner
    from gen6d_tpu.models.selector import ViewpointSelector
    from gen6d_tpu.pipeline.estimator import Gen6DEstimator

    import os
    dtype = jnp.bfloat16 if os.environ.get('GEN6D_BENCH_DTYPE', 'bf16') == 'bf16' \
        else None
    key = jax.random.PRNGKey(0)
    det = Detector(dtype=dtype)
    det_params = jax.jit(det.init)(key, jnp.zeros((2, 128, 128, 3)),
                                   jnp.zeros((1, 128, 128, 3)))
    sel = ViewpointSelector(dtype=dtype)
    poses0 = jnp.tile(jnp.eye(3, 4)[None], (3, 1, 1)).at[:, 2, 3].set(3.0)
    sel_params = jax.jit(sel.init)(key, jnp.zeros((5, 3, 128, 128, 3)), poses0,
                                   jnp.zeros(3), jnp.asarray([0.0, 0, 1]),
                                   jnp.zeros((1, 128, 128, 3)))
    refi = VolumeRefiner(dtype=dtype)
    K0 = jnp.asarray([[300.0, 0, 64], [0, 300, 64], [0, 0, 1]])[None]
    p0 = jnp.eye(3, 4)[None].at[:, 2, 3].set(3.0)
    ref_params = jax.jit(refi.init)(key, jnp.zeros((1, 128, 128, 3)), K0, p0,
                                    jnp.zeros((1, 2, 128, 128, 3)),
                                    jnp.tile(p0[:, None], (1, 2, 1, 1)),
                                    jnp.tile(K0[:, None], (1, 2, 1, 1)))

    est = Gen6DEstimator({}, detector=(det, det_params),
                         selector=(sel, sel_params),
                         refiner=(refi, ref_params))

    db = D.parse_database_name('synthetic/128')
    t0 = time.time()
    est.build(db, 'all')
    build_s = time.time() - t0

    que_ids = db.get_img_ids()[::4]
    imgs = np.stack([db.get_image(i) for i in que_ids], 0)
    K = db.get_K('0')
    Ks = np.stack([K] * len(imgs), 0)
    batch = 8
    n_batches = len(imgs) // batch

    # warmup: compiles the fused batched program + the single-query path
    est.predict_batch(imgs[:batch], Ks[:batch])
    pose, _ = est.predict(imgs[0], K)

    # single-query latency (p50)
    lat = []
    for i in range(6):
        t0 = time.time()
        est.predict_batch(imgs[i:i + 1], Ks[i:i + 1])
        lat.append(time.time() - t0)
    p50_ms = 1e3 * float(np.median(lat))

    # batched throughput
    t0 = time.time()
    for b in range(n_batches):
        poses = est.predict_batch(imgs[b * batch:(b + 1) * batch],
                                  Ks[b * batch:(b + 1) * batch])
    dt = time.time() - t0
    n = n_batches * batch
    pps = n / dt

    print(json.dumps({
        'metric': 'poses/sec/chip end-to-end (synthetic 480x640, 64 refs, '
                  'fused detect+select+refine x3, batch=8, bf16)',
        'value': round(pps, 3),
        'unit': 'poses/s',
        'vs_baseline': round(pps / 30.0, 3),
        'detail': {'n_queries': n, 'build_s': round(build_s, 2),
                   'p50_latency_ms': round(p50_ms, 1)},
    }))


if __name__ == '__main__':
    main()
