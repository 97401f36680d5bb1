"""Training dataset-name registries (port of reference
dataset/train_meta_info.py:10-91): map meta names to database-name lists, with
symmetric-object exclusions and reproducible splits. Every split degrades to []
when the corresponding data is absent (this environment ships no
GSO/CO3D/ShapeNet renderings; the synthetic scene stands in — see
gen6d_tpu/train/datasets.py).
"""
import os
import pickle
import random

import numpy as np

from gen6d_tpu.data.database import DATA_ROOT

GSO_ROOT = f'{DATA_ROOT}/google_scanned_objects'
CO3D_ROOT = f'{DATA_ROOT}/co3d'
ASSETS_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), 'assets')


def _loadtxt_list(path):
    if not os.path.exists(path):
        return []
    return np.loadtxt(path, dtype=str).reshape(-1).tolist()


def get_gso_split(resolution=128):
    """GSO train/val/test object split with symmetric exclusions
    (train_meta_info.py:10-32)."""
    cache = f'{DATA_ROOT}/gso_split.pkl'
    if os.path.exists(cache):
        with open(cache, 'rb') as f:
            train_fns, val_fns, test_fns = pickle.load(f)
    elif os.path.exists(GSO_ROOT):
        sym_fns = set(_loadtxt_list(os.path.join(ASSETS_DIR, 'gso_sym.txt')))
        gso_fns = [fn for fn in os.listdir(GSO_ROOT)
                   if os.path.isdir(os.path.join(GSO_ROOT, fn))
                   and fn not in sym_fns]
        random.seed(1234)
        random.shuffle(gso_fns)
        val_fns, test_fns, train_fns = gso_fns[:5], gso_fns[5:20], gso_fns[20:]
        os.makedirs(DATA_ROOT, exist_ok=True)
        with open(cache, 'wb') as f:
            pickle.dump([train_fns, val_fns, test_fns], f)
    else:
        train_fns, val_fns, test_fns = [], [], []
    fmt = 'gso/{}/white_%d' % resolution
    return ([fmt.format(fn) for fn in train_fns],
            [fmt.format(fn) for fn in val_fns],
            [fmt.format(fn) for fn in test_fns])


def get_co3d_split(category_num=None):
    """CO3D per-category sequence split (train_meta_info.py:40-66)."""
    if not os.path.exists(CO3D_ROOT) and not os.path.exists(f'{CO3D_ROOT}_256_512'):
        return [], []
    categories = _loadtxt_list(os.path.join(ASSETS_DIR, 'co3d_names.txt'))
    train_names, val_names = [], []
    for c in categories:
        fn = f'{CO3D_ROOT}_256_512/{c}/valid_seq_names.pkl'
        if not os.path.exists(fn):
            continue
        with open(fn, 'rb') as f:
            seq_names = pickle.load(f)
        random.seed(1234)
        random.shuffle(seq_names)
        names = [f'co3d_resize/{c}/{n}/256_512' for n in seq_names]
        ts, vs = names[2:], names[:2]
        train_names += ts if category_num is None else ts[:category_num]
        val_names += vs
    random.seed(1234)
    random.shuffle(val_names)
    return train_names, val_names[:10]


# ShapeNet symmetric/problem classes (train_meta_info.py:70-76)
SHAPENET_EXCLUDED_CLASSES = ('02747177', '02876657', '02880940', '02808440',
                             '04225987')


def get_shapenet_names():
    pkl = f'{DATA_ROOT}/shapenet/shapenet_render_v1.pkl'
    if not os.path.exists(pkl):
        return []
    with open(pkl, 'rb') as f:
        return pickle.load(f)


def build_name2database_names():
    """The reference's name2database_names registry (train_meta_info.py:81-91)
    + synthetic entries."""
    gso_train, gso_val, gso_test = get_gso_split(128)
    co3d_train, co3d_val = get_co3d_split()
    return {
        'gso_train_128': gso_train,
        'gso_val_128': gso_val,
        'co3d_train': co3d_train,
        'co3d_val': co3d_val,
        'shapenet_train': get_shapenet_names(),
        'linemod_train': [f'linemod/{o}' for o in
                          ('ape', 'can', 'holepuncher', 'iron', 'phone')],
        'genmop_train': [f'genmop/{n}-test' for n in
                         ('cup', 'knife', 'love', 'plug_cn', 'miffy')],
        # the procedural multi-object pool (GSO/ShapeNet stand-in); these
        # resolve to real databases (gen6d_tpu/train/datasets.py scene lists)
        'synthetic_train': [f'synthetic/64@{i+1}:{st}' for i, st in enumerate(
            ('cuboid-checks', 'oct-stripes', 'prism-noise', 'ico-blobs',
             'tet-checks', 'slab-stripes', 'cube-stripes', 'cuboid-noise'))],
        'synthetic_val': ['synthetic/64@9:prism-blobs'],
        'synthetic_test': ['synthetic/64'],
    }


name2database_names = build_name2database_names()
