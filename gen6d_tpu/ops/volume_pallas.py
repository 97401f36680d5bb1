"""Pallas TPU kernel: fused volume unproject-sample-and-reduce.

The refiner samples 32^3 volume points from each of rfn=6 reference feature
maps and reduces mean/std over views (reference refiner.py:184-240). Done
naively this materializes (rfn, 32768, 128) per query (~100MB) and is
HBM-gather-bound; a dense two-matmul formulation OOMs on the (pn, h, c)
intermediate. This kernel instead:

- keeps ALL rfn 32x32x128 feature maps resident in VMEM (~3MB for 6 views);
- processes points in tiles; bilinear sampling is a separable hat-weight
  matmul (TILE, h*w) @ (h*w, f) on the MXU — no gathers anywhere;
- accumulates sum and sum-of-squares across views in VMEM and writes only
  mean and unbiased std (the two tensors the volume CNN consumes).

Traffic per (query, iter): ~3MB of maps in + 2 x (32768,128) out, vs ~100MB+
for the materialized form.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gen6d_tpu.ops.sampling import sample_bilinear


def _sample_tile(feats_flat, xy, h, w, f, tile):
    """Bilinear-sample ``tile`` points from a (h*w, f) map via hat-weight
    matmul. xy: (tile, 2)."""
    x = xy[:, 0]
    y = xy[:, 1]
    # build the (tile, h*w) hat-weight matrix directly in flat index space
    # (Mosaic cannot reshape (tile,h,w)->(tile,h*w)); iota is int-typed on TPU
    ii = jax.lax.broadcasted_iota(jnp.int32, (tile, h * w), 1)
    yy = (ii // w).astype(jnp.float32)
    xx = (ii % w).astype(jnp.float32)
    W = (jnp.maximum(0.0, 1.0 - jnp.abs(y[:, None] - yy)) *
         jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - xx)))
    return jnp.dot(W, feats_flat, preferred_element_type=jnp.float32)


def _meanstd_kernel(feats_ref, coords_ref, mean_ref, std_ref, *, rfn, h, w, f,
                    tile):
    """Grid: (pn // tile,). feats_ref: (rfn, h*w, f) VMEM (whole);
    coords_ref: (rfn, tile, 2) VMEM (tile-sliced); outputs (tile, f)."""
    acc = jnp.zeros((tile, f), jnp.float32)
    acc2 = jnp.zeros((tile, f), jnp.float32)
    for r in range(rfn):  # static unroll over views
        s = _sample_tile(feats_ref[r], coords_ref[r], h, w, f, tile)
        acc = acc + s
        acc2 = acc2 + s * s
    mean = acc / rfn
    mean_ref[:] = mean
    # unbiased variance (torch.std default, refiner.py:237)
    var = jnp.maximum(acc2 - rfn * mean * mean, 0.0) / (rfn - 1)
    std_ref[:] = jnp.sqrt(var)


def _sample_kernel(feats_ref, coords_ref, out_ref, *, h, w, f, tile):
    """Single-view variant (the query volume features)."""
    out_ref[:] = _sample_tile(feats_ref[0], coords_ref[0], h, w, f, tile)


def _project(verts, proj):
    """verts: (pn,3); proj: (3,4) -> pixel xy (pn,2) with the reference's
    depth clamp (refiner.py:199-201). f32 matmul: bf16 projection shifts
    sample coordinates by ~0.05px."""
    cam = jnp.dot(verts, proj[:, :3].T,
                  precision=jax.lax.Precision.HIGHEST) + proj[:, 3]
    depth = jnp.maximum(cam[:, 2:], 1e-4)
    return cam[:, :2] / depth


@functools.partial(jax.jit, static_argnames=('tile', 'interpret'))
def volume_sample_meanstd(ref_feats, ref_projs, verts, tile=1024,
                          interpret=False):
    """Project ``verts`` into every reference view, bilinear-sample features,
    return (mean, std) over views.

    ref_feats: (rfn, h, w, f); ref_projs: (rfn, 3, 4) = K @ pose;
    verts: (pn, 3) -> ((pn, f), (pn, f)) float32.
    """
    rfn, h, w, f = ref_feats.shape
    pn = verts.shape[0]
    assert pn % tile == 0, (pn, tile)
    coords = jax.vmap(_project, in_axes=(None, 0))(verts, ref_projs)  # rfn,pn,2
    coords = coords.astype(jnp.float32)
    feats_flat = ref_feats.reshape(rfn, h * w, f)

    kernel = functools.partial(_meanstd_kernel, rfn=rfn, h=h, w=w, f=f,
                               tile=tile)
    grid = (pn // tile,)
    mean, std = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rfn, h * w, f), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rfn, tile, 2), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((pn, f), jnp.float32),
            jax.ShapeDtypeStruct((pn, f), jnp.float32),
        ),
        interpret=interpret,
    )(feats_flat, coords)
    return mean, std


@functools.partial(jax.jit, static_argnames=('tile', 'interpret'))
def volume_sample_single(feats, proj, verts, tile=1024, interpret=False):
    """Single-view volume sampling (query branch). feats: (h, w, f);
    proj: (3,4); verts: (pn,3) -> (pn, f) float32."""
    h, w, f = feats.shape
    pn = verts.shape[0]
    assert pn % tile == 0
    coords = _project(verts, proj).astype(jnp.float32)[None]  # 1,pn,2
    kernel = functools.partial(_sample_kernel, h=h, w=w, f=f, tile=tile)
    out = pl.pallas_call(
        kernel,
        grid=(pn // tile,),
        in_specs=[
            pl.BlockSpec((1, h * w, f), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 2), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, f), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pn, f), jnp.float32),
        interpret=interpret,
    )(feats.reshape(1, h * w, f), coords)
    return out


def volume_sample_meanstd_xla(ref_feats, ref_projs, verts):
    """Gather-based XLA reference implementation (slow path / CPU / tests)."""
    def one(feats, proj):
        xy = _project(verts, proj)
        return sample_bilinear(feats, xy).astype(jnp.float32)

    vol = jax.vmap(one)(ref_feats, ref_projs)  # rfn,pn,f
    return jnp.mean(vol, 0), jnp.std(vol, 0, ddof=1)
