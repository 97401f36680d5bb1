"""Building-block layers with exact torch semantics, in NHWC/NDHWC layouts.

- FrozenBatchNorm: eval-mode BatchNorm2d using stored running stats (the
  backbone is always frozen at inference; reference network/detector.py:188-197).
- instance_norm: torch InstanceNorm{1,2,3}d with affine=False — normalize each
  (sample, channel) over all spatial dims with biased variance, eps=1e-5
  (reference network/selector.py:28ff, refiner.py:19-21).
- l2_normalize: torch F.normalize(dim=channel).
"""
import flax.linen as nn
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    """Eval-mode BatchNorm over the channel (last) axis.

    All four tensors live in 'params' so checkpoint conversion is a plain tree
    map; training code masks them out of the optimizer. The affine folding is
    computed in f32; the elementwise apply follows the input dtype (bf16-safe).
    """
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param('scale', nn.initializers.ones, (self.features,))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        mean = self.param('mean', nn.initializers.zeros, (self.features,))
        var = self.param('var', nn.initializers.ones, (self.features,))
        inv = scale / jnp.sqrt(var + self.eps)
        return x * inv.astype(x.dtype) + (bias - mean * inv).astype(x.dtype)


def instance_norm(x, spatial_axes, eps=1e-5):
    """InstanceNorm (affine=False): normalize over ``spatial_axes`` per
    (sample, channel), biased variance. Statistics in f32 regardless of input
    dtype (bf16 mean/var are too coarse), output in the input dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=spatial_axes, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=spatial_axes, keepdims=True)
    return ((xf - mean) / jnp.sqrt(var + eps)).astype(x.dtype)


def l2_normalize(x, axis=-1, eps=1e-12):
    """torch F.normalize: x / max(||x||, eps). Norm in f32, output in the
    input dtype."""
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=axis, keepdims=True)
    return (x.astype(jnp.float32) / jnp.maximum(n, eps)).astype(x.dtype)


def max_pool_2x2(x):
    """torch MaxPool2d(2, 2) on NHWC (floor semantics)."""
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def conv3x3(features, name=None, dtype=None):
    return nn.Conv(features, (3, 3), padding=((1, 1), (1, 1)), name=name,
                   dtype=dtype)


def leaky_relu_01(x):
    """torch LeakyReLU(0.1) (reference network/refiner.py:149)."""
    return jnp.where(x >= 0, x, 0.1 * x)
