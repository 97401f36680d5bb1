"""Minimal PLY vertex reader (replaces the plyfile dependency; reference
utils/base_utils.py:21-25,60-66). Supports ascii and binary_little_endian."""
import numpy as np

_TYPES = {
    'char': 'i1', 'uchar': 'u1', 'short': 'i2', 'ushort': 'u2',
    'int': 'i4', 'uint': 'u4', 'float': 'f4', 'double': 'f8',
    'int8': 'i1', 'uint8': 'u1', 'int16': 'i2', 'uint16': 'u2',
    'int32': 'i4', 'uint32': 'u4', 'float32': 'f4', 'float64': 'f8',
}


def load_ply_vertices(path):
    """Return the vertex (x, y, z) array of a PLY file as float32 (n, 3)."""
    with open(path, 'rb') as f:
        if f.readline().strip() != b'ply':
            raise ValueError(f'{path} is not a PLY file')
        fmt = None
        n_verts = 0
        props = []          # (name, dtype) of the vertex element
        in_vertex = False
        while True:
            line = f.readline().strip().decode('ascii', 'ignore')
            if line.startswith('format'):
                fmt = line.split()[1]
            elif line.startswith('element'):
                _, name, cnt = line.split()
                in_vertex = name == 'vertex'
                if in_vertex:
                    n_verts = int(cnt)
            elif line.startswith('property') and in_vertex:
                parts = line.split()
                if parts[1] == 'list':
                    raise ValueError('list property in vertex element')
                props.append((parts[2], _TYPES[parts[1]]))
            elif line == 'end_header':
                break

        if fmt == 'ascii':
            rows = []
            for _ in range(n_verts):
                rows.append([float(v) for v in f.readline().split()[:len(props)]])
            data = np.asarray(rows)
            names = [p[0] for p in props]
            xyz = data[:, [names.index('x'), names.index('y'), names.index('z')]]
        elif fmt == 'binary_little_endian':
            dtype = np.dtype([(n, '<' + t) for n, t in props])
            data = np.frombuffer(f.read(dtype.itemsize * n_verts), dtype=dtype,
                                 count=n_verts)
            xyz = np.stack([data['x'], data['y'], data['z']], -1)
        else:
            raise ValueError(f'unsupported PLY format {fmt}')
    return np.asarray(xyz, np.float32)
