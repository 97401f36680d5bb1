"""VGG-11-BN pyramid backbone in Flax (NHWC).

Reproduces the reference's stage splits of torchvision vgg11_bn features
(reference network/pretrain_models.py:9-40,102-111):

  stage0: conv(3->64)   bn relu                      stride 1
  stage1: pool conv(64->128) bn relu                 stride 2
  stage2: pool conv(128->256) bn relu conv bn relu   stride 4
  stage3: pool conv(256->512) bn relu conv bn relu   stride 8   -> x0
  stage4: pool conv(512->512) bn relu conv bn        stride 16  -> x1 (NO final relu:
          split (21,27) ends at the bn, pretrain_models.py:110)
  final:  pool                                       stride 32  -> x2 = maxpool(x1)

Variants (selected by which stage outputs are returned):
- 'p8_16_32'  (VGGBNPretrain, detector/selector): (x0, x1, x2)
- 'p4_8_16'   (VGGBNPretrainV3, refiner): (s4, s8, s16)
- 'p1_2_4_8'  (VGGBNPretrainV4): (s1, s2, s4, s8)

The backbone is frozen pretrained weights; FrozenBatchNorm applies running
stats always (eval-mode BN, detector.py:188-197). ImageNet weights load via
gen6d_tpu.models.convert from a torch vgg11_bn state dict.

INPUT NORMALIZATION IS FOLDED INTO stage0's conv weights
(``fold_imagenet_normalization``): the models feed raw [0,1] images. The
torchvision Normalize(mean,std) applied in-graph (reference detector.py:156)
triggers a pathological XLA TPU compile (~230 s vs ~17 s for the refiner's
feature net) when the elementwise normalize feeds the first convolution, and
folding it into the kernel is exact: W'=W/std per input channel,
b'=b-sum(W*mean/std).
"""
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from gen6d_tpu.models.layers import FrozenBatchNorm, max_pool_2x2, conv3x3

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def fold_imagenet_normalization(vgg_params):
    """Fold (x-mean)/std into the stage0 conv so the backbone consumes raw
    [0,1] images. Exact: conv((x-m)/s) == conv'(x) with W'=W/s,
    b'=b-sum_khkwc(W[...,c,:]*m_c/s_c)."""
    p = dict(vgg_params)
    conv = dict(p['stage0_0'])
    cp = dict(conv['conv'])
    k = np.asarray(cp['kernel'])  # (kh,kw,3,64)
    b = np.asarray(cp['bias'])
    k_new = k / IMAGENET_STD[None, None, :, None]
    b_new = b - np.sum(k * (IMAGENET_MEAN / IMAGENET_STD)[None, None, :, None],
                       axis=(0, 1, 2))
    cp['kernel'] = k_new.astype(k.dtype)
    cp['bias'] = b_new.astype(b.dtype)
    conv['conv'] = cp
    p['stage0_0'] = conv
    return p


def _pad_with_mean(x):
    """Pad 1px border with the ImageNet mean, via concatenation of constant
    strips (no elementwise op feeding the conv — that triggers the XLA TPU
    compile pathology the folding works around)."""
    n, h, w, c = x.shape
    mean = jnp.asarray(IMAGENET_MEAN)
    row = jnp.broadcast_to(mean, (n, 1, w, c))
    x = jnp.concatenate([row, x, row], axis=1)
    col = jnp.broadcast_to(mean, (n, h + 2, 1, c))
    return jnp.concatenate([col, x, col], axis=2)


class _ConvBN(nn.Module):
    features: int
    relu: bool = True
    mean_pad: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        if self.mean_pad:
            # stage0 with folded input normalization: padding with the mean is
            # exactly zero-padding in the normalized domain, so the fold is
            # exact at the borders too
            x = _pad_with_mean(x)
            x = nn.Conv(self.features, (3, 3), padding='VALID', name='conv',
                        dtype=self.dtype)(x)
        else:
            x = conv3x3(self.features, name='conv', dtype=self.dtype)(x)
        x = FrozenBatchNorm(self.features, name='bn')(x)
        if self.relu:
            x = nn.relu(x)
        return x


class VGG11BN(nn.Module):
    """Pyramid VGG-11-BN; returns the stage outputs named by ``outputs``.

    ``dtype``: computation dtype for the convolutions (bf16 for the TPU fast
    path; params stay f32)."""
    outputs: Sequence[str] = ('s8', 's16', 's32')
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        feats = {}
        x = _ConvBN(64, mean_pad=True, name='stage0_0', dtype=self.dtype)(x)
        feats['s1'] = x
        x = max_pool_2x2(x)
        x = _ConvBN(128, name='stage1_0', dtype=self.dtype)(x)
        feats['s2'] = x
        x = max_pool_2x2(x)
        x = _ConvBN(256, name='stage2_0', dtype=self.dtype)(x)
        x = _ConvBN(256, name='stage2_1', dtype=self.dtype)(x)
        feats['s4'] = x
        x = max_pool_2x2(x)
        x = _ConvBN(512, name='stage3_0', dtype=self.dtype)(x)
        x = _ConvBN(512, name='stage3_1', dtype=self.dtype)(x)
        feats['s8'] = x
        x = max_pool_2x2(x)
        x = _ConvBN(512, name='stage4_0', dtype=self.dtype)(x)
        x = _ConvBN(512, relu=False, name='stage4_1', dtype=self.dtype)(x)  # split ends at bn
        feats['s16'] = x
        feats['s32'] = max_pool_2x2(x)
        return tuple(feats[k] for k in self.outputs)


# reference-variant aliases
def vgg_detector_selector():
    """VGGBNPretrain: strides 8/16/32 (pretrain_models.py:17-25)."""
    return VGG11BN(outputs=('s8', 's16', 's32'))


def vgg_refiner():
    """VGGBNPretrainV3: strides 4/8/16 (pretrain_models.py:61-72)."""
    return VGG11BN(outputs=('s4', 's8', 's16'))
