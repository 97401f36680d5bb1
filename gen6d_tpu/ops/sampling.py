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


def grid_sample_feats(feats, coords):
    """torch.nn.functional.grid_sample(mode='bilinear', align_corners=False,
    padding_mode='zeros') equivalent on *pixel* coordinates.

    feats: (h, w, c); coords: (n, 2) raw pixel (x, y) -> (n, c).
    The reference pipeline always converts pixel coords through normalize_coords
    before grid_sample (refiner.py:203-205); composing the two maps is identity
    on pixel coords, so we sample at pixel coords directly.
    """
    return sample_bilinear(feats, coords, 0.0)
