"""Git-persistable compressed weight snapshots.

Orbax checkpoint directories live under the gitignored ``data/`` tree and die
with the environment; these npz snapshots are small enough (f16-compressed,
~15-30 MB per network) to commit, so trained weights survive environment
resets. The serving loader (pipeline/loader.py) falls back to
``weights/<name>.npz`` when the orbax directory is missing, and the Trainer
exports a snapshot alongside every ``model_best`` save.

The reference persists weights as ``model_best.pth`` torch pickles
(reference train/trainer.py:187-194, estimator.py:121-123); this is the
rebuild's equivalent inference artifact in a plain-numpy container.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

# f16 snapshot precision: serving runs the networks in bfloat16 (8-bit
# exponent, 8-bit mantissa); within f16's NORMAL range [~6.1e-5, 6.5e4] its
# 11-bit mantissa carries more precision than bf16, so the snapshot adds no
# error beyond the serving cast there. Outside that range f16 loses to
# bf16/f32 (subnormal precision loss below 6.1e-5, flush-to-zero below
# ~6e-8), so tensors with out-of-range nonzeros stay f32.
_F16_MAX = 6.0e4
_F16_MIN_NORMAL = 6.2e-5


def save_params_npz(params, path):
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = jax.tree_util.keystr(kp)
        arr = np.asarray(leaf)
        if arr.dtype == np.float32 and np.isfinite(arr).all():
            mags = np.abs(arr[arr != 0])
            if (float(mags.max(initial=0.0)) < _F16_MAX
                    and float(mags.min(initial=1.0)) >= _F16_MIN_NORMAL):
                arr = arr.astype(np.float16)
        flat[key] = arr
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + '.tmp.npz'
    np.savez_compressed(tmp, **flat)
    os.replace(tmp, path)
    return path


def load_params_npz(path, ref_params):
    """Restore a snapshot into the structure of ``ref_params`` (leaf dtypes
    are taken from the reference tree, mirroring orbax StandardCheckpointer
    restore semantics)."""
    with np.load(path) as data:
        arrs = {k: data[k] for k in data.files}

    def fix(kp, ref_leaf):
        key = jax.tree_util.keystr(kp)
        if key not in arrs:
            raise KeyError(f'{path} is missing parameter {key}')
        # HOST cast (ml_dtypes handles bf16): an eager jnp.asarray(dtype=)
        # per leaf is a one-op XLA program — ~0.45s axon compile x 26 leaves
        return arrs[key].astype(jnp.asarray(ref_leaf).dtype)

    # one transfer per leaf, zero compiles (vs per-leaf eager converts)
    return jax.device_put(jax.tree_util.tree_map_with_path(fix, ref_params))
