"""Pallas TPU kernel: batched homography warp without gathers.

The refine loop's dominant device cost is the per-iteration prewarp — bilinear
homography warps of the query frames and the gathered reference crops
(replacing cv2.warpPerspective, reference utils/database_utils.py:21 /
network/refiner.py:300-313). XLA lowers `sample_bilinear`'s 4-tap indexing to
a generic per-point HBM gather, measured at ~34 ms per warp site per batch-8
on a v5e-class chip (docs/profile.md) — the single largest line in the serving
trace.

This kernel removes every gather:

- the full source image stays resident in VMEM (a 480x640x3 f32 frame is
  3.7 MB; a 256^2 canonical reference crop 786 KB);
- the output is processed in 32x32 point tiles; per tile, a dynamic VMEM
  slice cuts a (band, band) window around the tile's source footprint
  (footprints are computed outside the kernel — a homography is smooth, so a
  32x32 output tile reads a small contiguous source window);
- bilinear interpolation is separable hat weights: a (tile, band) x
  (band, band) row-interpolation MATMUL on the MXU followed by a column
  hat-weight multiply-reduce on the VPU — the same dense-sampling trick as
  ops/volume_pallas.py, but windowed so it scales to full images.

Zero-fill border semantics come for free: samples outside the (clamped)
window have |coord - support| >= 1 against every row/column in the window, so
both hat weights vanish — identical to cv2.BORDER_CONSTANT with value 0.

Exactness: for in-range samples the hat-weight form IS bilinear interpolation;
the only approximation is the static window size — a tile whose source
footprint exceeds ``band`` pixels (warp scale beyond ~(band-34)/(32*sqrt(2)))
clips its interpolation support. Callers pick ``band`` from the known crop
geometry (the refine prewarp's scales are bounded by construction; see
pipeline/estimator.py cfg['warp_band_*']) and tests/test_warp_pallas.py
verifies parity against the gather path across that envelope.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 32  # output tile edge; tp = TILE*TILE points per grid step


def _warp_kernel(starts_ref, src_ref, coords_ref, out_ref, *, c, band_r,
                 band_c, tp):
    """Grid: (n, T). src_ref: (1, c, hs, ws) VMEM (whole image, resident
    across the T axis); coords_ref: (1, 1, tp, 2) absolute source pixel
    coords; starts_ref: the FULL (n, T, 2) int32 window-origin array in SMEM
    indexed by program id (Mosaic requires SMEM block dims be full or
    8/128-divisible — a (1, 1, 2) block is rejected in compiled mode);
    out_ref: (1, 1, c, tp).

    Window origins are pre-aligned by ``_window_starts`` — rows to 8,
    columns to 128 — because Mosaic must statically prove dynamic-slice
    index alignment on the sublane/lane dims; the bands carry the extra
    slack (band_r = band+8, band_c = next multiple of 128 above band+128)."""
    i = pl.program_id(0)
    t = pl.program_id(1)
    r0 = starts_ref[i, t, 0]
    c0 = starts_ref[i, t, 1]
    x = coords_ref[0, 0, :, 0] - c0.astype(jnp.float32)
    y = coords_ref[0, 0, :, 1] - r0.astype(jnp.float32)
    # hat weights against the window's local row/col grid
    iv = jax.lax.broadcasted_iota(jnp.int32, (tp, band_r), 1).astype(jnp.float32)
    iu = jax.lax.broadcasted_iota(jnp.int32, (tp, band_c), 1).astype(jnp.float32)
    Wv = jnp.maximum(0.0, 1.0 - jnp.abs(y[:, None] - iv))  # tp, band_r
    Wu = jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - iu))  # tp, band_c
    for ch in range(c):  # static unroll; each channel is a contiguous plane
        win = src_ref[0, ch, pl.ds(pl.multiple_of(r0, 8), band_r),
                      pl.ds(pl.multiple_of(c0, 128), band_c)]
        rows = jnp.dot(Wv, win, preferred_element_type=jnp.float32)  # tp, band_c
        out_ref[0, 0, ch, :] = jnp.sum(Wu * rows, axis=1)


def _tile_coords(Hs, out_hw):
    """Inverse-map the output grid through each homography and tile it.

    Hs: (n, 3, 3) forward (src->dst) homographies. Returns
    (coords (n, T, tp, 2), starts (n, T, 2) int32), T = tiles per image.
    """
    n = Hs.shape[0]
    ho, wo = out_hw
    ys, xs = jnp.meshgrid(jnp.arange(ho, dtype=jnp.float32),
                          jnp.arange(wo, dtype=jnp.float32), indexing='ij')
    Hi = jax.lax.optimization_barrier(jnp.linalg.inv(Hs))  # n,3,3

    def one(hi):
        sx = hi[0, 0] * xs + hi[0, 1] * ys + hi[0, 2]
        sy = hi[1, 0] * xs + hi[1, 1] * ys + hi[1, 2]
        sz = hi[2, 0] * xs + hi[2, 1] * ys + hi[2, 2]
        sz = jnp.where(jnp.abs(sz) < 1e-8, 1e-8, sz)
        return jnp.stack([sx / sz, sy / sz], -1)  # ho,wo,2

    coords = jax.vmap(one)(Hi)
    ty, tx = ho // TILE, wo // TILE
    coords = coords.reshape(n, ty, TILE, tx, TILE, 2)
    coords = coords.transpose(0, 1, 3, 2, 4, 5).reshape(
        n, ty * tx, TILE * TILE, 2)
    return coords


def _window_starts(coords, src_hw, band_r, band_c):
    """Per-tile source window origins: clamped into the image and aligned
    (rows to 8, cols to 128) so Mosaic can statically prove the kernel's
    dynamic-slice index alignment. The aligned flooring loses up to 7 rows /
    127 cols at the window head — the widened bands restore coverage."""
    hs, ws = src_hw
    mins = jnp.floor(jnp.min(coords, axis=2)).astype(jnp.int32)  # n,T,2 (x,y)
    # (x,y) -> (row, col); back off 1px so the floor tap is interior
    r = ((mins[..., 1] - 1) // 8) * 8
    c = ((mins[..., 0] - 1) // 128) * 128
    r = jnp.clip(r, 0, ((hs - band_r) // 8) * 8)
    c = jnp.clip(c, 0, ((ws - band_c) // 128) * 128)
    return jnp.stack([r, c], -1)


@functools.partial(jax.jit, static_argnames=('out_hw', 'band', 'interpret'))
def warp_perspective_batch(imgs, Hs, out_hw, band=96, interpret=False):
    """Batched cv2.warpPerspective(INTER_LINEAR, BORDER_CONSTANT 0) on the MXU.

    imgs: (n, hs, ws, c) float; Hs: (n, 3, 3) forward homographies;
    out_hw: (ho, wo), both multiples of 32 -> (n, ho, wo, c) float32.
    ``band``: static source-window edge per 32x32 output tile; must satisfy
    band <= min(hs, ws) and cover 32*scale*(|cos a|+|sin a|)+3 for the warp's
    scale/rotation envelope.
    """
    n, hs, ws, c = imgs.shape
    ho, wo = out_hw
    assert ho % TILE == 0 and wo % TILE == 0, out_hw
    assert band % 8 == 0, band
    # alignment slack (see _warp_kernel): rows 8-aligned, cols 128-aligned;
    # fall back to the full dimension when the padded band reaches it
    band_r = band + 8 if band + 8 < hs else hs
    band_c = 128 * -(-(band + 128) // 128)
    if band_c >= ws:
        band_c = ws
    # _window_starts floors the clip bound to the 8/128 alignment grid; for a
    # non-multiple source dim (with the band below it) that drops up to 7
    # bottom rows / 127 right cols of coverage — in-image samples there would
    # silently output 0 (ADVICE r4). All current call sites use 640/480/256/128.
    assert band_r == hs or hs % 8 == 0, \
        f'source height {hs} must be a multiple of 8 when banded ({band_r})'
    assert band_c == ws or ws % 128 == 0, \
        f'source width {ws} must be a multiple of 128 when banded ({band_c})'
    T = (ho // TILE) * (wo // TILE)
    tp = TILE * TILE
    coords = _tile_coords(jnp.asarray(Hs, jnp.float32), out_hw)
    starts = _window_starts(coords, (hs, ws), band_r, band_c)
    src = jnp.transpose(imgs.astype(jnp.float32), (0, 3, 1, 2))  # n,c,hs,ws

    kernel = functools.partial(_warp_kernel, c=c, band_r=band_r,
                               band_c=band_c, tp=tp)
    out = pl.pallas_call(
        kernel,
        grid=(n, T),
        in_specs=[
            pl.BlockSpec((n, T, 2), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c, hs, ws), lambda i, t: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tp, 2), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, c, tp), lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, T, c, tp), jnp.float32),
        interpret=interpret,
    )(starts, src, coords)

    ty, tx = ho // TILE, wo // TILE
    out = out.reshape(n, ty, tx, c, TILE, TILE)
    return out.transpose(0, 1, 4, 2, 5, 3).reshape(n, ho, wo, c)


def warp_affine_batch(imgs, Ms, out_hw, band=96, interpret=False):
    """Batched cv2.warpAffine equivalent via the homography kernel.

    Ms: (n, 2, 3) forward affines (src -> dst)."""
    n = Ms.shape[0]
    bottom = jnp.tile(jnp.asarray([[[0.0, 0.0, 1.0]]], jnp.float32), (n, 1, 1))
    Hs = jnp.concatenate([jnp.asarray(Ms, jnp.float32), bottom], 1)
    return warp_perspective_batch(imgs, Hs, out_hw, band=band,
                                  interpret=interpret)
