"""Bilinear gather sampling (the XLA replacement for torch F.grid_sample and the
interpolation inside cv2 warps).

Convention: pixel centers sit at integer coordinates (cv2 convention; also what
torch grid_sample(align_corners=False) reduces to after the reference's
normalize_coords (network/operator.py:4-17) maps pixel p -> 2*(p+0.5)/s - 1).
"""
import jax.numpy as jnp


def sample_bilinear(img, coords, fill_value=0.0):
    """Bilinear-sample an image at continuous pixel coordinates with a constant
    border.

    img: (h, w, c); coords: (..., 2) as (x, y) -> (..., c).
    Out-of-range samples blend toward ``fill_value`` exactly like
    cv2.BORDER_CONSTANT / grid_sample(padding_mode='zeros'): neighbors outside
    the image contribute the fill value.
    """
    h, w = img.shape[0], img.shape[1]
    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1)
        yi_c = jnp.clip(yi, 0, h - 1)
        v = img[yi_c, xi_c]
        return jnp.where(valid[..., None], v, fill_value)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def sample_bilinear_dense(img, coords, accum_dtype=None):
    """Bilinear sampling as two dense MXU contractions (no gathers).

    img: (h, w, c); coords: (n, 2) as (x, y) -> (n, c). Equivalent to
    sample_bilinear with fill_value=0: the separable hat weights
    relu(1-|x - col|) x relu(1-|y - row|) reproduce bilinear interpolation,
    including constant-zero borders (outside taps get zero weight).

    Intended for SMALL feature maps (cost ~ n*h*w*c): the refiner samples 32^3
    volume points from 32x32x128 maps, where HBM gather traffic dominates the
    XLA gather formulation but the dense form is a pair of matmuls.
    """
    h, w = img.shape[0], img.shape[1]
    x = coords[..., 0].astype(jnp.float32)
    y = coords[..., 1].astype(jnp.float32)
    cols = jnp.arange(w, dtype=jnp.float32)
    rows = jnp.arange(h, dtype=jnp.float32)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - cols[None]))  # n,w
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(y[:, None] - rows[None]))  # n,h
    if accum_dtype is not None:
        wx = wx.astype(accum_dtype)
        wy = wy.astype(accum_dtype)
    # n,w @ (h,w,c) contracted in two steps; f32 accumulation on the MXU
    tmp = jnp.einsum('nw,hwc->nhc', wx, img,
                     preferred_element_type=jnp.float32)
    return jnp.einsum('nh,nhc->nc', wy, tmp,
                      preferred_element_type=jnp.float32)


def grid_sample_feats(feats, coords):
    """torch.nn.functional.grid_sample(mode='bilinear', align_corners=False,
    padding_mode='zeros') equivalent on *pixel* coordinates.

    feats: (h, w, c); coords: (n, 2) raw pixel (x, y) -> (n, c).
    The reference pipeline always converts pixel coords through normalize_coords
    before grid_sample (refiner.py:203-205); composing the two maps is identity
    on pixel coords, so we sample at pixel coords directly.
    """
    return sample_bilinear(feats, coords, 0.0)
