#!/usr/bin/env python
"""Thin wrapper preserving the reference's top-level CLI name (see
gen6d_tpu/cli/predict.py)."""
from gen6d_tpu.cli.predict import main

if __name__ == '__main__':
    main()
