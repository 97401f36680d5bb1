#!/usr/bin/env python
"""Thin wrapper preserving the reference's top-level CLI name (see
gen6d_tpu/cli/train_model.py)."""
from gen6d_tpu.cli.train_model import main

if __name__ == '__main__':
    main()
