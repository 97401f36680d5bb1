"""Image resizes and normalization with exact torch conventions.

The detector/selector/refiner were trained on torch F.interpolate outputs
(reference network/detector.py:201,225-226,240,243; refiner.py:74-75), so the
TPU build reproduces those conventions bit-for-bit (up to float assoc).
Images are NHWC (TPU-native layout) float32 in [0, 1].
"""
import jax
import jax.numpy as jnp

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)


def normalize_imagenet(imgs):
    """torchvision Normalize(mean, std) on NHWC [0,1] images
    (reference network/detector.py:156)."""
    return (imgs - IMAGENET_MEAN) / IMAGENET_STD


def resize_bilinear(imgs, out_hw):
    """torch F.interpolate(mode='bilinear', align_corners=False) equivalent.

    imgs: (n, h, w, c) -> (n, H, W, c). Half-pixel centers, edge clamp,
    no antialias (matches torch's default).
    """
    n, _, _, c = imgs.shape
    return jax.image.resize(imgs, (n, out_hw[0], out_hw[1], c), method='linear',
                            antialias=False)


def _nearest_indices(out_size, in_size):
    # torch 'nearest': src = floor(dst * in/out)
    return jnp.floor(jnp.arange(out_size) * (in_size / out_size)).astype(jnp.int32)


def resize_nearest(imgs, out_hw):
    """torch F.interpolate(mode='nearest') equivalent (the default mode used to
    shrink detector refs to 120x120, reference network/detector.py:201)."""
    iy = _nearest_indices(out_hw[0], imgs.shape[1])
    ix = _nearest_indices(out_hw[1], imgs.shape[2])
    return imgs[:, iy][:, :, ix]


def upsample_nearest(x, factor):
    """torch F.interpolate(scale_factor=k) (nearest) for integer k — exact
    repeat (reference network/detector.py:225-226)."""
    x = jnp.repeat(x, factor, axis=1)
    x = jnp.repeat(x, factor, axis=2)
    return x


def color_map_forward(rgb_uint8):
    """uint8 HWC -> float32 [0,1] (reference utils/base_utils.py:117-118)."""
    return jnp.asarray(rgb_uint8, jnp.float32) / 255.0
