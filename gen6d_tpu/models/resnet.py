"""ResNet-18 pyramid backbone in Flax (NHWC).

Port of the reference's ``ResNet18Pretrain`` (network/pretrain_models.py:
113-195) — the torchvision resnet18 trunk (conv1/bn1/relu/maxpool +
layer1..layer4, BasicBlock [2,2,2,2]) with the fc head dropped. The
reference defines it but none of the three production networks use it; it
is included for component parity and as an alternative backbone.

Same conventions as ``vgg.py``: frozen eval-mode BatchNorm (running stats
applied always), NHWC layout, optional bf16 compute dtype with f32 params,
and pyramid stage outputs selected by name:

  s4  = layer1 output (stride 4, 64ch)
  s8  = layer2 output (stride 8, 128ch)
  s16 = layer3 output (stride 16, 256ch)
  s32 = layer4 output (stride 32, 512ch)

ImageNet weights load from a torchvision resnet18 state dict via
``gen6d_tpu.models.convert.convert_resnet18``; input normalization is the
caller's concern (apply ``vgg.IMAGENET_MEAN/STD`` or fold into conv1 with
``fold_imagenet_normalization_resnet``).
"""
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from gen6d_tpu.models.layers import FrozenBatchNorm
from gen6d_tpu.models.vgg import IMAGENET_MEAN, IMAGENET_STD


def fold_imagenet_normalization_resnet(params):
    """Fold (x-mean)/std into conv1 (no bias in torch resnet conv1: the fold
    constant lands in the following FrozenBatchNorm's mean parameter).
    conv((x-m)/s) == conv'(x) - c  with W'=W/s and c = sum(W*m/s) folded into
    bn.mean. Exact at the borders too because ResNet18.__call__ pads conv1's
    input with the ImageNet mean (= zero in the normalized domain)."""
    p = dict(params)
    conv = dict(p['conv1'])
    k = np.asarray(conv['kernel'])  # (7,7,3,64)
    k_new = (k / IMAGENET_STD[None, None, :, None]).astype(k.dtype)
    c = np.sum(k * (IMAGENET_MEAN / IMAGENET_STD)[None, None, :, None],
               axis=(0, 1, 2))
    conv['kernel'] = k_new
    p['conv1'] = conv
    bn = dict(p['bn1'])
    bn['mean'] = (np.asarray(bn['mean']) + c).astype(np.asarray(bn['mean']).dtype)
    p['bn1'] = bn
    return p


class _BasicBlock(nn.Module):
    """torchvision BasicBlock: conv3x3-bn-relu-conv3x3-bn + skip, relu.
    ``stride`` 2 downsamples and adds a 1x1-conv-bn projection on the skip
    (pretrain_models.py:165-170)."""
    features: int
    stride: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        identity = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False, name='conv1',
                    dtype=self.dtype)(x)
        y = FrozenBatchNorm(self.features, name='bn1')(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name='conv2', dtype=self.dtype)(y)
        y = FrozenBatchNorm(self.features, name='bn2')(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name='down_conv',
                               dtype=self.dtype)(x)
            identity = FrozenBatchNorm(self.features, name='down_bn')(identity)
        return nn.relu(y + identity)


class ResNet18(nn.Module):
    """Pyramid ResNet-18; returns the stage outputs named by ``outputs``.

    ``folded_normalization`` (default True, matching
    ``convert_resnet18(fold_normalization=True)``) selects conv1's border
    padding value: mean-padding is border-exact only when the ImageNet
    normalization is folded into conv1 (mean == zero in the normalized
    domain); with external normalization torch zero-pads the normalized
    input, so the pad must be 0 (ADVICE r4)."""
    outputs: Sequence[str] = ('s8', 's16', 's32')
    dtype: object = None
    folded_normalization: bool = True

    @nn.compact
    def __call__(self, x):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        # pad conv1's input with the ImageNet mean when normalization is
        # folded into the kernel (equals torch's zero padding in the
        # normalized domain, see vgg._pad_with_mean); zeros otherwise
        n, h, w, c = x.shape
        mean = jnp.asarray(
            IMAGENET_MEAN if self.folded_normalization else np.zeros(3),
            x.dtype)
        row = jnp.broadcast_to(mean, (n, 3, w, c))
        x = jnp.concatenate([row, x, row], axis=1)
        col = jnp.broadcast_to(mean, (n, h + 6, 3, c))
        x = jnp.concatenate([col, x, col], axis=2)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding='VALID',
                    use_bias=False, name='conv1', dtype=self.dtype)(x)
        x = FrozenBatchNorm(64, name='bn1')(x)
        x = nn.relu(x)
        # torch MaxPool2d(3, stride=2, padding=1): pad with -inf so the border
        # max ignores padding
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        feats = {}
        plan = [('layer1', 64, 1, 's4'), ('layer2', 128, 2, 's8'),
                ('layer3', 256, 2, 's16'), ('layer4', 512, 2, 's32')]
        for name, ch, stride, tag in plan:
            x = _BasicBlock(ch, stride, name=f'{name}_0', dtype=self.dtype)(x)
            x = _BasicBlock(ch, 1, name=f'{name}_1', dtype=self.dtype)(x)
            feats[tag] = x
        return tuple(feats[k] for k in self.outputs)
