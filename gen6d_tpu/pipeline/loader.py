"""Estimator construction from YAML configs (the reference's config system:
load_cfg + per-class default_cfg merge + sub-config paths,
estimator.py:106-125, base_utils.py:49-51).

Checkpoint sources:
- ``torch``: a reference ``model_best.pth`` converted via gen6d_tpu.models.convert;
- ``orbax``: a gen6d_tpu-trained checkpoint directory;
- missing/none: random init (smoke/demo mode; a warning is printed).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from gen6d_tpu.models import name2network
from gen6d_tpu.models.convert import load_torch_checkpoint, name2converter


def load_cfg(path):
    with open(path) as f:
        return yaml.safe_load(f)


def _random_init(network, kind, key):
    # example args built in NUMPY: every eager jnp op here (tile /
    # .at[].set / asarray) is a separate one-op XLA program that the axon
    # backend compiles for ~0.45s each — across the three networks this was
    # ~25s of load_estimator wall time (docs/profile.md build_s breakdown)
    z = np.zeros
    if kind == 'detector':
        return jax.jit(network.init)(key, z((2, 128, 128, 3), np.float32),
                                     z((1, 128, 128, 3), np.float32))
    pose = np.eye(3, 4, dtype=np.float32)
    pose[2, 3] = 3.0
    if kind == 'selector':
        poses = np.tile(pose[None], (3, 1, 1))
        return jax.jit(network.init)(key, z((5, 3, 128, 128, 3), np.float32),
                                     poses, z(3, np.float32),
                                     np.asarray([0.0, 0, 1], np.float32),
                                     z((1, 128, 128, 3), np.float32))
    K = np.asarray([[300.0, 0, 64], [0, 300, 64], [0, 0, 1]], np.float32)[None]
    return jax.jit(network.init)(key, z((1, 128, 128, 3), np.float32), K,
                                 pose[None], z((1, 2, 128, 128, 3), np.float32),
                                 np.tile(pose[None, None], (1, 2, 1, 1)),
                                 np.tile(K[:, None], (1, 2, 1, 1)))


def _npz_fallback(cfg):
    """Committed weight-snapshot path for a network config (weights_io).

    Defaults to weights/<run_name>.npz where run_name is the training-run
    directory of the configured orbax path (data/model/<run_name>/model_best),
    matching the Trainer's export convention."""
    ckpt = cfg.get('checkpoint') or {}
    if 'fallback' in ckpt:
        return ckpt['fallback']
    path = ckpt.get('path', '')
    run = os.path.basename(os.path.dirname(path)) if path else ''
    return os.path.join('weights', f"{run or cfg.get('name', cfg['network'])}.npz")


def load_network(cfg, dtype=None):
    """cfg: dict with 'network' (detector/selector/refiner), optional
    'checkpoint' {'type','path'}, optional 'network_cfg'. Returns
    (module, params)."""
    kind = cfg['network']
    network = name2network[kind](cfg.get('network_cfg'), dtype=dtype)
    ckpt = cfg.get('checkpoint')
    if ckpt and ckpt.get('type') == 'torch' and os.path.exists(ckpt['path']):
        sd = load_torch_checkpoint(ckpt['path'])
        params = name2converter[kind](sd)
        params = jax.device_put(params)  # one transfer per leaf, no compiles
        print(f'loaded {kind} from torch checkpoint {ckpt["path"]}')
    elif ckpt and ckpt.get('type') == 'orbax' and os.path.exists(ckpt['path']):
        import orbax.checkpoint as ocp
        ref = _random_init(network, kind, jax.random.PRNGKey(0))
        params = ocp.StandardCheckpointer().restore(
            os.path.abspath(ckpt['path']), ref)
        print(f'loaded {kind} from orbax checkpoint {ckpt["path"]}')
    elif ckpt and ckpt.get('type') == 'npz' and os.path.exists(ckpt['path']):
        from gen6d_tpu.models.weights_io import load_params_npz
        ref = _random_init(network, kind, jax.random.PRNGKey(0))
        params = load_params_npz(ckpt['path'], ref)
        print(f'loaded {kind} from npz snapshot {ckpt["path"]}')
    elif ckpt and os.path.exists(_npz_fallback(cfg)):
        # orbax dirs live under gitignored data/ and die with the
        # environment; the committed weights/<name>.npz snapshot survives
        from gen6d_tpu.models.weights_io import load_params_npz
        ref = _random_init(network, kind, jax.random.PRNGKey(0))
        params = load_params_npz(_npz_fallback(cfg), ref)
        print(f'loaded {kind} from npz snapshot {_npz_fallback(cfg)} '
              f'(orbax checkpoint {ckpt.get("path")} missing)')
    else:
        if ckpt:
            print(f'WARNING: checkpoint {ckpt.get("path")} not found; '
                  f'{kind} uses random weights')
        else:
            print(f'WARNING: no checkpoint configured; {kind} uses random weights')
        params = _random_init(network, kind, jax.random.PRNGKey(0))
    return network, params


def load_estimator(cfg_path):
    """Build a Gen6DEstimator from a composite YAML (the gen6d_pretrain.yaml
    pattern: top-level estimator cfg + per-network sub-config paths)."""
    from gen6d_tpu.utils.jit_cache import enable_persistent_cache
    enable_persistent_cache()
    from gen6d_tpu.pipeline.estimator import Gen6DEstimator
    cfg = load_cfg(cfg_path)
    dtype = {'bfloat16': jnp.bfloat16, 'float32': None,
             None: None}[cfg.get('dtype')]
    base = os.path.dirname(os.path.abspath(cfg_path))

    def sub(name):
        p = cfg[name]
        if isinstance(p, str):
            p = load_cfg(p if os.path.isabs(p) else os.path.join(base, p))
        return p

    detector = load_network(sub('detector'), dtype)
    selector = load_network(sub('selector'), dtype)
    refiner = None
    if cfg.get('refiner') is not None:
        refiner = load_network(sub('refiner'), dtype)
    polish = None
    if cfg.get('refiner_polish') is not None:
        # precision cascade: a second refiner for the last
        # refine_polish_iter iterations (estimator.default_cfg)
        polish = load_network(sub('refiner_polish'), dtype)
    est_cfg = {k: v for k, v in cfg.items()
               if k in Gen6DEstimator.default_cfg}
    return Gen6DEstimator(est_cfg, detector=detector, selector=selector,
                          refiner=refiner, refiner_polish=polish)
