"""Export an orbax model_best checkpoint to a committed npz snapshot.

Usage: python scripts/export_weights.py --cfg configs/detector_train.yaml
Restores data/model/<name>/model_best into the network's param structure and
writes weights/<name>.npz (see gen6d_tpu/models/weights_io.py). The Trainer
does this automatically on every best-save; this CLI covers runs from before
that existed and ad-hoc exports.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--cfg', required=True, help='training yaml')
    parser.add_argument('--tag', default='model_best')
    parser.add_argument('--out', default=None)
    args = parser.parse_args()

    import yaml
    with open(args.cfg) as f:
        cfg = yaml.safe_load(f)

    import jax
    import orbax.checkpoint as ocp
    from gen6d_tpu.pipeline.loader import _random_init
    from gen6d_tpu.models import name2network
    from gen6d_tpu.models.weights_io import save_params_npz

    kind = cfg['network']
    network = name2network[kind](cfg.get('network_cfg'))
    ref = _random_init(network, kind, jax.random.PRNGKey(0))
    path = os.path.abspath(
        os.path.join(cfg.get('model_dir', 'data/model'), cfg['name'], args.tag))
    params = ocp.StandardCheckpointer().restore(path, ref)
    out = args.out or os.path.join('weights', f"{cfg['name']}.npz")
    save_params_npz(params, out)
    print(f'exported {path} -> {out} '
          f'({os.path.getsize(out) / 1e6:.1f} MB)')


if __name__ == '__main__':
    main()
