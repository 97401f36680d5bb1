"""Weight-expand the 3-scale detector snapshot to a 4-scale warm start.

The score fusion Dense (score_conv0) consumes scale-major/level-minor
correlation channels (models/detector.py:detect), so adding the +0.5
detection scale appends 3 input channels. New rows init to ZERO: the
expanded net computes exactly the 3-scale function at step 0 (the +0.5
branch contributes nothing until trained) — a warm start the from-scratch
recipe can't match (round-2: from-scratch stalled at IoU 0.37).

Usage: python scripts/expand_detector_scales.py \
         [--src weights/detector_synthetic.npz] \
         [--dst weights/detector_pyramid_init.npz] \
         [--old_scales 3] [--new_scales 4]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--src', default='weights/detector_synthetic.npz')
    ap.add_argument('--dst', default='weights/detector_pyramid_init.npz')
    ap.add_argument('--old_scales', type=int, default=3)
    ap.add_argument('--new_scales', type=int, default=4)
    args = ap.parse_args()

    z = np.load(args.src)
    out = {}
    key = "['params']['score_conv0']['kernel']"
    for k in z.files:
        v = z[k]
        if k == key:
            assert v.shape[0] == args.old_scales * 3, v.shape
            pad = np.zeros((3 * (args.new_scales - args.old_scales),
                            v.shape[1]), v.dtype)
            # scale-major order: old scales stay a prefix, new scale appends
            v = np.concatenate([v, pad], 0)
            print(f'{key}: {z[k].shape} -> {v.shape} (new rows zero)')
        out[k] = v
    np.savez(args.dst, **out)
    print(f'wrote {args.dst} ({len(out)} arrays)')


if __name__ == '__main__':
    main()
