"""Training CLI (port of reference train_model.py:6-11)."""
import argparse

import yaml

from gen6d_tpu.train.trainer import Trainer


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--cfg', type=str, required=True)
    args = parser.parse_args()
    with open(args.cfg) as f:
        cfg = yaml.safe_load(f)
    Trainer(cfg).run()


if __name__ == '__main__':
    main()
