#!/usr/bin/env python
"""Thin wrapper preserving the reference's top-level CLI name (see
gen6d_tpu/cli/eval.py)."""
from gen6d_tpu.cli.eval import main

if __name__ == '__main__':
    main()
