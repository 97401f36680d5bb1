"""Real-checkpoint parity harness.

No pretrained `model_best.pth` checkpoints ship with this environment, so full
numerical parity against the reference networks cannot be asserted yet. This
harness makes parity a ONE-COMMAND check the moment weights appear
(reference checkpoints load at estimator.py:117-125):

- ``--make-goldens``: synthesize reference-layout random state dicts (exact
  torch key names + shapes per network/detector.py:136-185,
  network/selector.py:12-111, network/refiner.py:16-177), convert them through
  gen6d_tpu.models.convert, structurally verify the converted tree against the
  Flax init tree (every leaf shape must match), run each network on fixed
  inputs and store the outputs under tests/goldens/.
- ``--check-goldens``: regenerate and compare against the stored outputs —
  catches converter or model numerical drift.
- ``--check-checkpoint PATH --net NAME``: load a real torch checkpoint,
  convert, structurally verify, and print per-output activation statistics.
- ``--eval CFG``: run cli/eval.py end-to-end with the given estimator config
  (e.g. a gen6d_pretrain.yaml pointing at converted reference checkpoints).

Usage once reference weights exist:
    python scripts/parity.py --check-checkpoint data/model/detector_pretrain/model_best.pth --net detector
    python scripts/parity.py --eval configs/gen6d_pretrain.yaml --object linemod/cat
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'tests', 'goldens')

# torchvision vgg11_bn features: (conv_idx, bn_idx, out_ch, in_ch)
_VGG = [(0, 1, 64, 3), (4, 5, 128, 64), (8, 9, 256, 128), (11, 12, 256, 256),
        (15, 16, 512, 256), (18, 19, 512, 512), (22, 23, 512, 512),
        (25, 26, 512, 512)]


def _vgg_entries(prefix):
    out = []
    for ci, bi, o, i in _VGG:
        out.append((f'{prefix}.features.{ci}', 'conv2d', (o, i, 3, 3)))
        out.append((f'{prefix}.features.{bi}', 'bn', (o,)))
    return out


def _heads(prefix, dims):
    """3x 3x3-conv head: Sequential indices 0/2/4."""
    return [(f'{prefix}.{i}', 'conv2d', (o, ic, 3, 3))
            for i, (o, ic) in zip((0, 2, 4), dims)]


def detector_spec():
    spec = _vgg_entries('backbone')
    spec += [('score_conv.0', 'dense', (64, 12)),     # Conv3d 1x1x1, 3*4 scales
             ('score_conv.2', 'dense', (64, 64))]
    spec += _heads('score_predict', [(64, 64), (64, 64), (1, 64)])
    spec += _heads('scale_predict', [(64, 64), (64, 64), (1, 64)])
    spec += _heads('offset_predict', [(64, 64), (64, 64), (2, 64)])
    return spec


_CORR = {0: [(1, 64, 512), (4, 64, 64), (7, 128, 64), (10, 128, 128),
             (13, 256, 128), (16, 256, 256)],
         1: [(1, 128, 512), (4, 128, 128), (7, 256, 128), (10, 256, 256)],
         2: [(1, 256, 512), (4, 256, 256)]}


def selector_spec():
    spec = _vgg_entries('backbone')
    for level, entries in _CORR.items():
        for i, o, ic in entries:
            spec.append((f'corr_conv_list.{level}.{i}', 'conv3d',
                         (o, ic, 1, 3, 3)))
    spec += [('corr_feats_conv.0', 'dense', (512, 768)),
             ('corr_feats_conv.3', 'dense', (512, 512)),
             ('score_process.0', 'dense', (512, 515)),
             ('score_process.2', 'dense', (512, 512))]
    for i in range(2):
        for nm in ('conv_query', 'conv_key', 'conv_feats', 'conv_merge'):
            spec.append((f'atts.{i}.{nm}', 'dense', (512, 512)))
        spec.append((f'atts.{i}.norm.norm', 'layernorm', (512,)))
        spec += [(f'mlps.{i}.0', 'dense', (512, 1024)),
                 (f'mlps.{i}.3', 'dense', (512, 512))]
    spec += [('score_predict.0', 'dense', (512, 512)),
             ('score_predict.2', 'dense', (1, 512)),
             ('angle_predict.0', 'dense', (512, 515 * 5)),
             ('angle_predict.2', 'dense', (512, 512)),
             ('angle_predict.4', 'dense', (1, 512)),
             ('view_point_encoder.0', 'dense', (128, 3)),
             ('view_point_encoder.2', 'dense', (256, 128)),
             ('view_point_encoder.4', 'dense', (512, 256))]
    return spec


def refiner_spec():
    spec = _vgg_entries('feature_net.backbone')
    for name, mid, ic in (('conv0', 64, 256), ('conv1', 256, 512),
                          ('conv2', 256, 512), ('conv_out', 128, 192)):
        out1 = 128 if name == 'conv_out' else 64
        spec += [(f'feature_net.{name}.0', 'conv2d', (mid, ic, 3, 3)),
                 (f'feature_net.{name}.3', 'conv2d', (out1, mid, 3, 3))]
    spec += [('volume_net.mean_embed.0', 'conv3d', (64, 256, 3, 3, 3)),
             ('volume_net.mean_embed.3', 'conv3d', (64, 64, 3, 3, 3)),
             ('volume_net.var_embed.0', 'conv3d', (64, 128, 3, 3, 3)),
             ('volume_net.var_embed.3', 'conv3d', (64, 64, 3, 3, 3)),
             ('volume_net.conv0.0', 'conv3d', (64, 128, 3, 3, 3)),
             ('volume_net.conv1.0', 'conv3d', (128, 64, 3, 3, 3)),
             ('volume_net.conv2.0', 'conv3d', (128, 128, 3, 3, 3)),
             ('volume_net.conv3.0', 'conv3d', (256, 128, 3, 3, 3)),
             ('volume_net.conv4.0', 'conv3d', (256, 256, 3, 3, 3)),
             ('volume_net.conv5.0', 'conv3d', (512, 256, 3, 3, 3)),
             ('volume_net.conv5.3', 'conv3d', (512, 512, 3, 3, 3)),
             ('regressor.fc.0.0', 'dense', (512, 512 * 64)),
             ('regressor.fc.1.0', 'dense', (512, 512)),
             ('regressor.fcr', 'dense', (4, 512)),
             ('regressor.fct', 'dense', (2, 512)),
             ('regressor.fcs', 'dense', (1, 512))]
    return spec


name2spec = {'detector': detector_spec, 'selector': selector_spec,
             'refiner': refiner_spec}


def synth_state_dict(kind, seed=0):
    """Random state dict with the reference's exact key names and shapes."""
    rng = np.random.RandomState(seed)
    sd = {}
    for key, k, shape in name2spec[kind]():
        if k == 'bn':
            sd[f'{key}.weight'] = rng.randn(*shape).astype(np.float32) * 0.1 + 1
            sd[f'{key}.bias'] = rng.randn(*shape).astype(np.float32) * 0.1
            sd[f'{key}.running_mean'] = rng.randn(*shape).astype(np.float32) * 0.1
            sd[f'{key}.running_var'] = np.abs(
                rng.randn(*shape).astype(np.float32)) * 0.1 + 0.5
        elif k == 'layernorm':
            sd[f'{key}.weight'] = rng.randn(*shape).astype(np.float32) * 0.1 + 1
            sd[f'{key}.bias'] = rng.randn(*shape).astype(np.float32) * 0.1
        else:
            fan_in = int(np.prod(shape[1:]))
            sd[f'{key}.weight'] = (rng.randn(*shape) /
                                   np.sqrt(fan_in)).astype(np.float32)
            sd[f'{key}.bias'] = rng.randn(shape[0]).astype(np.float32) * 0.01
    return sd


def _build(kind):
    import jax
    from gen6d_tpu.models import name2network
    from gen6d_tpu.pipeline.loader import _random_init
    net = name2network[kind]()
    params = _random_init(net, kind, jax.random.PRNGKey(0))
    return net, params


def _tree_shapes(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_shapes(v, prefix + (k,)))
        else:
            out['/'.join(prefix + (k,))] = tuple(v.shape)
    return out


def structural_check(kind, converted, reference_params):
    """Every leaf of the converted tree must match the Flax init tree."""
    a = _tree_shapes(converted)
    b = _tree_shapes(reference_params)
    missing = sorted(set(b) - set(a))
    extra = sorted(set(a) - set(b))
    bad = sorted(k for k in set(a) & set(b) if a[k] != b[k])
    if missing or extra or bad:
        lines = [f'{kind}: converted tree mismatch']
        lines += [f'  missing: {k} {b[k]}' for k in missing]
        lines += [f'  extra:   {k} {a[k]}' for k in extra]
        lines += [f'  shape:   {k} converted {a[k]} != model {b[k]}' for k in bad]
        raise AssertionError('\n'.join(lines))


def _fixed_inputs(kind):
    import jax.numpy as jnp
    rng = np.random.RandomState(7)
    if kind == 'detector':
        return (jnp.asarray(rng.rand(2, 128, 128, 3), jnp.float32),
                jnp.asarray(rng.rand(1, 128, 128, 3), jnp.float32))
    if kind == 'selector':
        poses = jnp.tile(jnp.eye(3, 4)[None], (3, 1, 1)).at[:, 2, 3].set(3.0)
        return (jnp.asarray(rng.rand(5, 3, 64, 64, 3), jnp.float32), poses,
                jnp.zeros(3), jnp.asarray([0.0, 0, 1]),
                jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32))
    K = jnp.asarray([[300.0, 0, 64], [0, 300, 64], [0, 0, 1]])[None]
    pose = jnp.eye(3, 4)[None].at[:, 2, 3].set(3.0)
    return (jnp.asarray(rng.rand(1, 128, 128, 3), jnp.float32), K, pose,
            jnp.asarray(rng.rand(1, 2, 128, 128, 3), jnp.float32),
            jnp.tile(pose[:, None], (1, 2, 1, 1)),
            jnp.tile(K[:, None], (1, 2, 1, 1)))


def _run(kind, params):
    import jax
    from gen6d_tpu.models import name2network
    net = name2network[kind]()
    out = jax.jit(net.apply)(params, *_fixed_inputs(kind))
    # vol_coords is parameter-independent geometry — not a parity signal
    return {k: np.asarray(v) for k, v in out.items() if k != 'vol_coords'}


def convert_and_verify(kind, sd):
    import jax
    from gen6d_tpu.models.convert import name2converter
    params = name2converter[kind](sd)
    _, ref_params = _build(kind)
    structural_check(kind, params, ref_params)
    return jax.tree.map(np.asarray, params)


def make_goldens():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for kind in ('detector', 'selector', 'refiner'):
        sd = synth_state_dict(kind)
        params = convert_and_verify(kind, sd)
        out = _run(kind, params)
        np.savez(os.path.join(GOLDEN_DIR, f'parity_{kind}.npz'), **out)
        print(f'{kind}: goldens written '
              f'({", ".join(f"{k}{v.shape}" for k, v in out.items())})')


def check_goldens(kinds=('detector', 'selector', 'refiner'), atol=1e-4):
    ok = True
    for kind in kinds:
        path = os.path.join(GOLDEN_DIR, f'parity_{kind}.npz')
        golden = np.load(path)
        sd = synth_state_dict(kind)
        params = convert_and_verify(kind, sd)
        out = _run(kind, params)
        for k in golden.files:
            err = float(np.max(np.abs(out[k] - golden[k])))
            status = 'OK' if err < atol else 'FAIL'
            if err >= atol:
                ok = False
            print(f'{kind}.{k}: max|diff|={err:.2e} {status}')
    if not ok:
        raise SystemExit(1)


def check_checkpoint(path, kind):
    from gen6d_tpu.models.convert import load_torch_checkpoint
    sd = load_torch_checkpoint(path)
    params = convert_and_verify(kind, sd)
    print(f'{kind}: checkpoint {path} converts cleanly; output stats:')
    for k, v in _run(kind, params).items():
        print(f'  {k}: shape {v.shape} mean {v.mean():+.4f} std {v.std():.4f}')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--make-goldens', action='store_true')
    ap.add_argument('--check-goldens', action='store_true')
    ap.add_argument('--check-checkpoint', type=str, default=None)
    ap.add_argument('--net', type=str, default='detector')
    ap.add_argument('--eval', type=str, default=None)
    ap.add_argument('--object', type=str, default='linemod/cat')
    args = ap.parse_args()
    if args.make_goldens:
        make_goldens()
    elif args.check_goldens:
        check_goldens()
    elif args.check_checkpoint:
        check_checkpoint(args.check_checkpoint, args.net)
    elif args.eval:
        from gen6d_tpu.cli.eval import evaluate
        evaluate(args.eval, args.object)
    else:
        ap.print_help()


if __name__ == '__main__':
    main()
