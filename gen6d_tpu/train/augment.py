"""On-device training augmentation: procedural backgrounds, a photometric
augmentation bank, and distractor compositing helpers.

TPU-first equivalents of the reference's CPU worker augmentation
(dataset/train_dataset.py):
- COCO background compositing (:99-119,260-291) -> multi-octave procedural
  noise backgrounds synthesized in-graph (no COCO ships with the env);
- the photometric module bank GaussianBlur/ColorJitter x4/MotionBlur/
  AdditiveShade (:32-97) -> vectorized jnp ops gated per sample by random
  on/off masks;
- distractor pasting (:374-408,580-597) -> mask compositing of warped crops
  of other pool views (gen6d_tpu/train/datasets.py builds the warps).

Everything is jit/vmap-friendly: static shapes, no data-dependent control
flow; per-sample choices are blends/selects.
"""
import jax
import jax.numpy as jnp

from gen6d_tpu.ops.image import resize_bilinear


# ------------------------------------------------------------- backgrounds
def octave_background(key, n, size, octaves=(4, 8, 16, 32, 64)):
    """(n,size,size,3) smooth random textures in [0,1]: a random-weight sum of
    bilinearly upsampled uniform-noise grids + a base color. Mimics the value
    statistics of natural-image backgrounds (COCO stand-in)."""
    keys = jax.random.split(key, len(octaves) + 3)
    base = jax.random.uniform(keys[0], (n, 1, 1, 3))
    # random per-sample octave weights; sparse-ish via softmax temperature
    w = jax.random.dirichlet(keys[1], jnp.ones(len(octaves) + 1), (n,))
    acc = base * w[:, 0, None, None, None]
    for i, g in enumerate(octaves):
        noise = jax.random.uniform(keys[2 + i], (n, g, g, 3))
        up = resize_bilinear(noise, (size, size))
        acc = acc + up * w[:, i + 1, None, None, None]
    # random contrast stretch around the mean
    c = jax.random.uniform(keys[-1], (n, 1, 1, 1), minval=0.6, maxval=1.8)
    mean = jnp.mean(acc, axis=(1, 2, 3), keepdims=True)
    return jnp.clip((acc - mean) * c + mean, 0.0, 1.0)


# --------------------------------------------------------- photometric bank
def _separable_blur(imgs, kernel):
    """Depthwise separable blur with a 1D kernel, NHWC."""
    k = kernel / jnp.sum(kernel)
    kh = k.reshape(1, -1, 1, 1)
    x = jnp.moveaxis(imgs, -1, 1).reshape(-1, 1, imgs.shape[1], imgs.shape[2])
    x = jax.lax.conv_general_dilated(x, k.reshape(1, 1, -1, 1),
                                     (1, 1), 'SAME',
                                     dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
    x = jax.lax.conv_general_dilated(x, k.reshape(1, 1, 1, -1),
                                     (1, 1), 'SAME',
                                     dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
    x = x.reshape(imgs.shape[0], imgs.shape[3], imgs.shape[1], imgs.shape[2])
    return jnp.moveaxis(x, 1, -1)


def _motion_blurs(imgs, taps=7):
    """(4,n,h,w,3): directional blurs along 0/45/90/135 degrees via one
    grouped conv each (cheap next to the backbone)."""
    n, h, w, c = imgs.shape
    x = jnp.moveaxis(imgs, -1, 1).reshape(n * c, 1, h, w)
    outs = []
    for d in range(4):
        k = jnp.zeros((taps, taps))
        idx = jnp.arange(taps)
        if d == 0:
            k = k.at[taps // 2, :].set(1.0)
        elif d == 1:
            k = k.at[idx, idx].set(1.0)
        elif d == 2:
            k = k.at[:, taps // 2].set(1.0)
        else:
            k = k.at[idx, taps - 1 - idx].set(1.0)
        k = k / jnp.sum(k)
        y = jax.lax.conv_general_dilated(x, k.reshape(1, 1, taps, taps),
                                         (1, 1), 'SAME',
                                         dimension_numbers=('NCHW', 'OIHW',
                                                            'NCHW'))
        outs.append(jnp.moveaxis(y.reshape(n, c, h, w), 1, -1))
    return jnp.stack(outs, 0)


def photometric_aug(key, imgs, p_blur=0.25, p_motion=0.15, p_jitter=0.8,
                    p_shade=0.3, p_noise=0.5):
    """The reference photometric bank (train_dataset.py:32-97), vectorized:
    per-sample random gaussian blur, motion blur, color jitter
    (brightness/contrast/per-channel gain/desaturation), additive shade
    (low-frequency multiplicative field), and pixel noise.

    imgs: (n,h,w,3) in [0,1] -> same shape, clipped to [0,1].
    """
    n, h, w, _ = imgs.shape
    ks = jax.random.split(key, 16)

    def on(k, p, shape=(n, 1, 1, 1)):
        return (jax.random.uniform(k, shape) < p).astype(imgs.dtype)

    # gaussian blur (sigma via 5-tap binomial, strength-lerped)
    blur = _separable_blur(imgs, jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0]))
    t = jax.random.uniform(ks[0], (n, 1, 1, 1)) * on(ks[1], p_blur)
    imgs = (1 - t) * imgs + t * blur

    # motion blur along a random direction
    mb = _motion_blurs(imgs)  # 4,n,h,w,3
    sel = jax.random.randint(ks[2], (n,), 0, 4)
    mb = jnp.take_along_axis(mb, sel[None, :, None, None, None], 0)[0]
    t = on(ks[3], p_motion)
    imgs = (1 - t) * imgs + t * mb

    # color jitter: brightness/contrast/channel gains/desaturation
    jit_on = on(ks[4], p_jitter)
    bright = jax.random.uniform(ks[5], (n, 1, 1, 1), minval=-0.15, maxval=0.15)
    contrast = jax.random.uniform(ks[6], (n, 1, 1, 1), minval=0.7, maxval=1.3)
    gains = jax.random.uniform(ks[7], (n, 1, 1, 3), minval=0.8, maxval=1.2)
    sat = jax.random.uniform(ks[8], (n, 1, 1, 1), minval=0.6, maxval=1.0)
    jittered = (imgs - 0.5) * contrast + 0.5 + bright
    jittered = jittered * gains
    gray = jnp.mean(jittered, -1, keepdims=True)
    jittered = gray + (jittered - gray) * sat
    imgs = (1 - jit_on) * imgs + jit_on * jittered

    # additive shade: low-frequency multiplicative field in [1-a, 1+a]
    field = resize_bilinear(jax.random.uniform(ks[9], (n, 4, 4, 1)), (h, w))
    amp = jax.random.uniform(ks[10], (n, 1, 1, 1), minval=0.2, maxval=0.6)
    shade = 1.0 + amp * (2.0 * field - 1.0)
    t = on(ks[11], p_shade)
    imgs = imgs * ((1 - t) + t * shade)

    # pixel noise
    sigma = jax.random.uniform(ks[12], (n, 1, 1, 1), maxval=0.03)
    t = on(ks[13], p_noise)
    imgs = imgs + t * sigma * jax.random.normal(ks[14], imgs.shape,
                                                imgs.dtype)
    return jnp.clip(imgs, 0.0, 1.0)
