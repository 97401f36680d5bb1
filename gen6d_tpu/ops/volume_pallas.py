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
    # unbiased variance (torch.std default, refiner.py:237); epsilon keeps the
    # gradient finite at zero variance (points outside every view)
    var = jnp.maximum(acc2 - rfn * mean * mean, 0.0) / (rfn - 1)
    std_ref[:] = jnp.sqrt(var + 1e-12)


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
def volume_sample_meanstd(ref_feats, ref_projs, verts, tile=512,
                          interpret=False):
    """Project ``verts`` into every reference view, bilinear-sample features,
    return (mean, std) over views.

    ref_feats: (rfn, h, w, f); ref_projs: (rfn, 3, 4) = K @ pose;
    verts: (pn, 3) -> ((pn, f), (pn, f)) float32. Tile 512: larger tiles
    exceed the 16MB scoped VMEM limit under a batch-8 vmap.
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
def volume_sample_single(feats, proj, verts, tile=512, interpret=False):
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


def _meanstd_bwd_kernel(feats_ref, coords_ref, gmean_ref, gstd_ref, dfeats_ref,
                        *, rfn, h, w, f, tile, eps):
    """Backward: dL/dF_r = W_r^T @ (g_mean/rfn + g_std*(s_r-mean)/(std*(rfn-1))).

    Grid over point tiles; dfeats blocks are revisited every step (TPU grid is
    sequential) and accumulated.
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dfeats_ref[:] = jnp.zeros_like(dfeats_ref)

    def hat_weights(r):
        xy = coords_ref[r]
        x = xy[:, 0]
        y = xy[:, 1]
        ii = jax.lax.broadcasted_iota(jnp.int32, (tile, h * w), 1)
        yy = (ii // w).astype(jnp.float32)
        xx = (ii % w).astype(jnp.float32)
        return (jnp.maximum(0.0, 1.0 - jnp.abs(y[:, None] - yy)) *
                jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - xx)))

    # recompute per-view samples and the mean/std for this tile. W matrices
    # are NOT retained across views (rfn of them blow the 16MB VMEM budget);
    # they are rebuilt in the gradient loop below (cheap VPU work).
    samples = []
    acc = jnp.zeros((tile, f), jnp.float32)
    for r in range(rfn):
        s = jnp.dot(hat_weights(r), feats_ref[r],
                    preferred_element_type=jnp.float32)
        samples.append(s)
        acc = acc + s
    mean = acc / rfn
    var = jnp.zeros((tile, f), jnp.float32)
    for r in range(rfn):
        d = samples[r] - mean
        var = var + d * d
    std = jnp.sqrt(var / (rfn - 1) + eps)
    std = jnp.maximum(std, 1e-8)  # guard the division below

    gmean = gmean_ref[:]
    gstd = gstd_ref[:]
    for r in range(rfn):
        G = gmean / rfn + gstd * (samples[r] - mean) / (std * (rfn - 1))
        # W^T @ G: contract the tile axis
        dF = jax.lax.dot_general(hat_weights(r), G, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dfeats_ref[r] = dfeats_ref[r] + dF


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def volume_sample_meanstd_grad(ref_feats, ref_projs, verts, tile=512,
                               interpret=False):
    """Differentiable wrapper around the fused kernel: gradients flow to
    ``ref_feats`` only (projections and volume coords are pose-derived inputs,
    never trained — reference refiner.py:225-246 semantics)."""
    return volume_sample_meanstd(ref_feats, ref_projs, verts, tile=tile,
                                 interpret=interpret)


def _vsm_fwd(ref_feats, ref_projs, verts, tile, interpret):
    out = volume_sample_meanstd(ref_feats, ref_projs, verts, tile=tile,
                                interpret=interpret)
    return out, (ref_feats, ref_projs, verts)


def _vsm_bwd(tile, interpret, res, g):
    ref_feats, ref_projs, verts = res
    gmean, gstd = g
    rfn, h, w, f = ref_feats.shape
    pn = verts.shape[0]
    coords = jax.vmap(_project, in_axes=(None, 0))(verts, ref_projs)
    coords = coords.astype(jnp.float32)
    kernel = functools.partial(_meanstd_bwd_kernel, rfn=rfn, h=h, w=w, f=f,
                               tile=tile, eps=1e-12)
    dfeats = pl.pallas_call(
        kernel,
        grid=(pn // tile,),
        in_specs=[
            pl.BlockSpec((rfn, h * w, f), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rfn, tile, 2), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rfn, h * w, f), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rfn, h * w, f), jnp.float32),
        interpret=interpret,
    )(ref_feats.reshape(rfn, h * w, f), coords,
      jnp.asarray(gmean, jnp.float32), jnp.asarray(gstd, jnp.float32))
    dfeats = dfeats.reshape(rfn, h, w, f).astype(ref_feats.dtype)
    return (dfeats, jnp.zeros_like(ref_projs), jnp.zeros_like(verts))


volume_sample_meanstd_grad.defvjp(_vsm_fwd, _vsm_bwd)


def _single_bwd_kernel(coords_ref, g_ref, dfeats_ref, *, h, w, f, tile):
    """dL/dF = W^T @ g for the single-view sampler."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dfeats_ref[:] = jnp.zeros_like(dfeats_ref)

    xy = coords_ref[0]
    x = xy[:, 0]
    y = xy[:, 1]
    ii = jax.lax.broadcasted_iota(jnp.int32, (tile, h * w), 1)
    yy = (ii // w).astype(jnp.float32)
    xx = (ii % w).astype(jnp.float32)
    W = (jnp.maximum(0.0, 1.0 - jnp.abs(y[:, None] - yy)) *
         jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - xx)))
    dF = jax.lax.dot_general(W, g_ref[:], (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dfeats_ref[0] = dfeats_ref[0] + dF


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def volume_sample_single_grad(feats, proj, verts, tile=512, interpret=False):
    """Differentiable single-view sampler (gradients to ``feats`` only)."""
    return volume_sample_single(feats, proj, verts, tile=tile,
                                interpret=interpret)


def _vss_fwd(feats, proj, verts, tile, interpret):
    return (volume_sample_single(feats, proj, verts, tile=tile,
                                 interpret=interpret), (feats, proj, verts))


def _vss_bwd(tile, interpret, res, g):
    feats, proj, verts = res
    h, w, f = feats.shape
    pn = verts.shape[0]
    coords = _project(verts, proj).astype(jnp.float32)[None]
    kernel = functools.partial(_single_bwd_kernel, h=h, w=w, f=f, tile=tile)
    dfeats = pl.pallas_call(
        kernel,
        grid=(pn // tile,),
        in_specs=[
            pl.BlockSpec((1, tile, 2), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h * w, f), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, h * w, f), jnp.float32),
        interpret=interpret,
    )(coords, jnp.asarray(g, jnp.float32))
    return (dfeats.reshape(h, w, f).astype(feats.dtype),
            jnp.zeros_like(proj), jnp.zeros_like(verts))


volume_sample_single_grad.defvjp(_vss_fwd, _vss_bwd)


def volume_sample_meanstd_xla(ref_feats, ref_projs, verts):
    """Gather-based XLA reference implementation (slow path / CPU / tests)."""
    def one(feats, proj):
        xy = _project(verts, proj)
        return sample_bilinear(feats, xy).astype(jnp.float32)

    vol = jax.vmap(one)(ref_feats, ref_projs)  # rfn,pn,f
    return jnp.mean(vol, 0), jnp.std(vol, 0, ddof=1)
