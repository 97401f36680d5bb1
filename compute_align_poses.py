#!/usr/bin/env python
"""Thin wrapper preserving the reference's top-level CLI name (see
gen6d_tpu/cli/compute_align_poses.py)."""
from gen6d_tpu.cli.compute_align_poses import main

if __name__ == '__main__':
    main()
