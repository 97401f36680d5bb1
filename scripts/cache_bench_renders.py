"""Populate the committed synthetic render cache for the bench scene.

bench.py builds 'synthetic/128' (128 procedural 480x640 renders) on every
fresh environment; painter's-algorithm rendering costs ~20s of build_s on the
1-core host (docs/profile.md §3). The renders are deterministic, so they are
rendered once here and committed under assets/synth_cache/ (PNG, lossless);
SyntheticScene.render loads them when present.

Usage: python scripts/cache_bench_renders.py [database_name ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ['GEN6D_SYNTH_CACHE_WRITE'] = '1'
os.environ.setdefault('JAX_PLATFORMS', 'cpu')


def main():
    from gen6d_tpu.data import database as D
    names = sys.argv[1:] or ['synthetic/128']
    for name in names:
        db = D.parse_database_name(name)
        t0 = time.time()
        for i in db.get_img_ids():
            db.scene.render(int(i))
        print(f'{name}: {len(db.get_img_ids())} renders cached in '
              f'{db.scene._disk_dir} ({time.time() - t0:.1f}s)')


if __name__ == '__main__':
    main()
