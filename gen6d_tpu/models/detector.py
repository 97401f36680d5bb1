"""Detector: multi-scale query x reference feature correlation (Flax, NHWC).

Port of reference network/detector.py:136-304, re-laid-out for TPU:
- the reference-feature correlation (torch F.conv2d with ref feats as filters,
  detector.py:222-224) becomes lax.conv_general_dilated with an HWIO kernel
  built from the cached reference features -> runs on the MXU;
- the Conv3d(1x1x1) score fusion (detector.py:159-163) is a Dense over the
  (scale x level) channel axis applied per reference view;
- all shapes are static per query size; the 4 detection scales unroll at trace
  time (detector.py:141,232-243).

Functional interface (no mutable module state): ``load_ref`` returns the
reference feature cache; ``detect`` consumes it.
"""
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import lax

from gen6d_tpu.models.vgg import VGG11BN
from gen6d_tpu.ops.image import (resize_bilinear, resize_nearest,
                                 upsample_nearest)

DEFAULT_DETECTOR_CFG: Dict[str, Any] = {
    # per-level correlation score statistics (detector.py:138-139)
    'vgg_score_stats': ((36.264317, 13.151907),
                       (13910.291, 5345.965),
                       (829.70807, 387.98788)),
    'vgg_score_max': 10.0,
    'detection_scales': (-1.0, -0.5, 0.0, 0.5),
    # train the VGG backbone (reference detector.py:142 'train_feats'; BN stays
    # frozen either way). Required when no pretrained weights are available.
    'train_feats': False,
    # 'stats': the fixed constants above (they are statistics of the
    # PRETRAINED backbone's correlation magnitudes — only meaningful with
    # converted reference weights); 'adaptive': standardize each level by its
    # own per-forward moments (stop-gradient), which is the same idea computed
    # on the fly and works for any backbone.
    'score_norm': 'stats',
    # rematerialize the backbone in backward (jax.checkpoint): required to fit
    # train_feats at 512^2 x 4 detection scales in a single chip's HBM
    'remat': False,
    # shared detect pyramid (VERDICT r4 item 6): ONE backbone pass at the
    # query's native resolution instead of one full VGG sweep per detection
    # scale (reference detector.py:232-243 re-runs the backbone per scale).
    # Negative scales correlate on bilinearly RESIZED FEATURE MAPS (the
    # info-preserving, cheap direction); positive scales correlate the native
    # maps against RESIZED REFERENCE FILTER banks (downsampled filters match
    # smaller objects — cheaper and better-posed than correlating an
    # upsampled map that carries no new information); scale 0 is exactly the
    # per-scale computation. An approximation of image-space rescaling, so
    # the heads must be TRAINED with it on (score_norm adaptive re-centers
    # each branch either way).
    'shared_pyramid': False,
}

POOL_RATIO = 8  # detector.py:155


def _round_up_32(v):
    v = int(round(v))
    return v if v % 32 == 0 else (v // 32 + 1) * 32


class ConvHead(nn.Module):
    """3x 3x3-conv head (detector.py:164-184)."""
    out_dim: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (3, 3), padding=1, name='conv0', dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(64, (3, 3), padding=1, name='conv1', dtype=self.dtype)(x)
        x = nn.relu(x)
        # final head in f32 (decoded to pixel offsets/log scales)
        return nn.Conv(self.out_dim, (3, 3), padding=1, name='conv2')(
            x.astype(jnp.float32))


import functools

import jax


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def correlate(que_feats, ref_feats, padding):
    """Correlation of query feature maps against per-view reference filters.

    que_feats: (qn, h, w, f); ref_feats: (rfn, hr, wr, f) -> (qn, h', w', rfn).
    Equivalent to torch F.conv2d(que, ref, padding) (detector.py:222-224).

    TPU note: implemented as a lax.scan over the hr*wr kernel offsets, each step
    a pointwise (qn*h'*w', f) @ (f, rfn) MXU matmul on a shifted window. A
    direct lax.conv with the 15x15x512 reference kernel takes minutes to
    compile on the TPU backend; this formulation compiles in seconds and keeps
    all FLOPs on the MXU.

    The op is bilinear, so it carries a custom VJP that re-slices the padded
    inputs in backward instead of letting autodiff save one feature window per
    scan step (225 x 34MB of residuals per level at train shapes — the
    difference between fitting in HBM and a 7GB OOM with train_feats).
    """
    return _correlate_fwd(que_feats, ref_feats, padding)[0]


def _correlate_fwd(que_feats, ref_feats, padding):
    qn, h, w, f = que_feats.shape
    rfn, kh, kw, _ = ref_feats.shape
    p = padding
    ho = h + 2 * p - kh + 1
    wo = w + 2 * p - kw + 1
    que_pad = jnp.pad(que_feats, ((0, 0), (p, p), (p, p), (0, 0)))
    kernel = jnp.transpose(ref_feats, (1, 2, 3, 0)).reshape(kh * kw, f, rfn)

    def step(acc, args):
        k_idx, kmat = args
        dy = k_idx // kw
        dx = k_idx % kw
        win = lax.dynamic_slice(que_pad, (0, dy, dx, 0), (qn, ho, wo, f))
        acc = acc + jnp.einsum('nhwf,fr->nhwr', win, kmat,
                               preferred_element_type=jnp.float32)
        return acc, None

    init = jnp.zeros((qn, ho, wo, rfn), jnp.float32)
    out, _ = lax.scan(step, init, (jnp.arange(kh * kw), kernel), unroll=8)
    return out, (que_feats, ref_feats)


def _correlate_bwd(padding, res, g):
    """g: (qn,ho,wo,rfn) -> (dque (qn,h,w,f), dref (rfn,kh,kw,f)).

    d/dque: every kernel offset scatters g @ ref_k^T back onto its window;
    d/dref: per-offset einsum of the input window with g. Same scan-of-MXU-
    matmuls shape as forward; O(que + g) memory.
    """
    que_feats, ref_feats = res
    qn, h, w, f = que_feats.shape
    rfn, kh, kw, _ = ref_feats.shape
    p = padding
    ho = h + 2 * p - kh + 1
    wo = w + 2 * p - kw + 1
    que_pad = jnp.pad(que_feats.astype(jnp.float32),
                      ((0, 0), (p, p), (p, p), (0, 0)))
    kernel = jnp.transpose(ref_feats, (1, 2, 3, 0)).reshape(kh * kw, f, rfn)
    g = g.astype(jnp.float32)

    def step(dq_pad, args):
        k_idx, kmat = args
        dy = k_idx // kw
        dx = k_idx % kw
        contrib = jnp.einsum('nhwr,fr->nhwf', g, kmat,
                             preferred_element_type=jnp.float32)
        cur = lax.dynamic_slice(dq_pad, (0, dy, dx, 0), (qn, ho, wo, f))
        dq_pad = lax.dynamic_update_slice(dq_pad, cur + contrib,
                                          (0, dy, dx, 0))
        win = lax.dynamic_slice(que_pad, (0, dy, dx, 0), (qn, ho, wo, f))
        dref_k = jnp.einsum('nhwf,nhwr->fr', win, g,
                            preferred_element_type=jnp.float32)
        return dq_pad, dref_k

    dq_init = jnp.zeros((qn, h + 2 * p, w + 2 * p, f), jnp.float32)
    dq_pad, dref_ks = lax.scan(step, dq_init, (jnp.arange(kh * kw), kernel),
                               unroll=8)
    dque = dq_pad[:, p:p + h, p:p + w, :].astype(que_feats.dtype)
    dref = jnp.transpose(dref_ks.reshape(kh, kw, f, rfn),
                         (3, 0, 1, 2)).astype(ref_feats.dtype)
    return dque, dref


correlate.defvjp(_correlate_fwd, _correlate_bwd)


class Detector(nn.Module):
    cfg: Any = None
    dtype: Any = None

    def _cfg(self, key):
        merged = dict(DEFAULT_DETECTOR_CFG)
        if self.cfg:
            merged.update(self.cfg)
        return merged[key]

    def setup(self):
        vgg_cls = nn.remat(VGG11BN) if self._cfg('remat') else VGG11BN
        self.backbone = vgg_cls(outputs=('s8', 's16', 's32'),
                                dtype=self.dtype)
        # Conv3d 1x1x1 fusion == Dense over the scale*level channel axis
        self.score_conv0 = nn.Dense(64, dtype=self.dtype)
        self.score_conv1 = nn.Dense(64, dtype=self.dtype)
        self.score_predict = ConvHead(1, dtype=self.dtype)
        self.scale_predict = ConvHead(1, dtype=self.dtype)
        self.offset_predict = ConvHead(2, dtype=self.dtype)

    def extract_feats(self, imgs):
        """imgs: (n,h,w,3) in [0,1] -> (s8, s16, s32) feats. Frozen unless
        cfg['train_feats'] (reference detector.py:142,183-197)."""
        # ImageNet normalization is folded into the backbone's first conv
        # (models/vgg.py:fold_imagenet_normalization)
        x0, x1, x2 = self.backbone(imgs)
        if self._cfg('train_feats'):
            return x0, x1, x2
        return lax.stop_gradient(x0), lax.stop_gradient(x1), lax.stop_gradient(x2)

    @staticmethod
    def _odd(v):
        """Nearest odd kernel size >= 3 (odd kernels keep 'same'-padded
        correlation outputs at the input's spatial size)."""
        v = max(3, int(round(v)))
        return v if v % 2 == 1 else v + 1

    def load_ref(self, ref_imgs):
        """ref_imgs: (rfn,h,w,3) -> reference feature cache (3 levels at 120x120:
        15/7/3 spatial, detector.py:199-205).

        With cfg['shared_pyramid'], additionally caches a resized filter bank
        per POSITIVE detection scale: {'base': (x0,x1,x2), '+0.5': ...}."""
        ref_imgs = resize_nearest(ref_imgs, (120, 120))
        feats = self.extract_feats(ref_imgs)
        if not self._cfg('shared_pyramid'):
            return feats
        banks = {'base': feats}
        for scale in self._cfg('detection_scales'):
            if scale > 0:
                banks[f'+{scale}'] = tuple(
                    resize_bilinear(f, (self._odd(f.shape[1] * 2.0 ** -scale),
                                        self._odd(f.shape[2] * 2.0 ** -scale)))
                    for f in feats)
        return banks

    def get_scores(self, que_imgs, ref_feats):
        """-> (qn, rfn, h/8, w/8, 3) normalized correlation scores
        (detector.py:218-230)."""
        return self._scores_from_feats(self.extract_feats(que_imgs), ref_feats)

    def _scores_from_feats(self, que_feats, ref_feats):
        que_x0, que_x1, que_x2 = que_feats
        ref_x0, ref_x1, ref_x2 = ref_feats
        s2 = correlate(que_x2, ref_x2, (ref_x2.shape[1] - 1) // 2)
        s1 = correlate(que_x1, ref_x1, (ref_x1.shape[1] - 1) // 2)
        s0 = correlate(que_x0, ref_x0, (ref_x0.shape[1] - 1) // 2)
        s2 = upsample_nearest(s2, 4)
        s1 = upsample_nearest(s1, 2)
        smax = self._cfg('vgg_score_max')
        out = []
        if self._cfg('score_norm') == 'adaptive':
            # standardize each level by its own per-forward moments: the fixed
            # vgg_score_stats are exactly such moments precomputed from the
            # pretrained backbone; computed live they work for any backbone
            for s in (s0, s1, s2):
                sf = s.astype(jnp.float32)
                mu = lax.stop_gradient(jnp.mean(sf))
                sd = lax.stop_gradient(jnp.std(sf) + 1e-6)
                out.append(jnp.clip((sf - mu) / sd, -smax, smax))
        else:
            stats = self._cfg('vgg_score_stats')
            for s, (mu, sd) in zip((s0, s1, s2), stats):
                out.append(jnp.clip((s.astype(jnp.float32) - mu) / sd, -smax,
                                    smax))
        return jnp.stack(out, -1)  # qn, h/8, w/8, rfn, 3

    def detect(self, que_imgs, ref_feats):
        """que_imgs: (qn,h,w,3) with h,w % 32 == 0 -> raw heads
        (detector.py:232-266)."""
        qn, hq, wq, _ = que_imgs.shape
        hs, ws = hq // POOL_RATIO, wq // POOL_RATIO
        scores = []
        if self._cfg('shared_pyramid'):
            # one backbone pass; per-scale correlation on resized feature
            # maps (scale<0) / resized filter banks (scale>0) — see the
            # shared_pyramid cfg comment
            que_feats = self.extract_feats(que_imgs)
            for scale in self._cfg('detection_scales'):
                if scale == 0:
                    s = self._scores_from_feats(que_feats, ref_feats['base'])
                elif scale > 0:
                    s = self._scores_from_feats(que_feats,
                                                ref_feats[f'+{scale}'])
                else:
                    h8 = max(4, -(-int(round(
                        que_feats[0].shape[1] * 2.0 ** scale)) // 4) * 4)
                    w8 = max(4, -(-int(round(
                        que_feats[0].shape[2] * 2.0 ** scale)) // 4) * 4)
                    qf = (resize_bilinear(que_feats[0], (h8, w8)),
                          resize_bilinear(que_feats[1], (h8 // 2, w8 // 2)),
                          resize_bilinear(que_feats[2], (h8 // 4, w8 // 4)))
                    s = self._scores_from_feats(qf, ref_feats['base'])
                _, h_, w_, rfn, _ = s.shape
                s = s.reshape(qn, h_, w_, rfn * 3)
                s = resize_bilinear(s, (hs, ws))
                scores.append(s.reshape(qn, hs, ws, rfn, 3))
        else:
            for scale in self._cfg('detection_scales'):
                ht = _round_up_32(hq * 2 ** scale)
                wt = _round_up_32(wq * 2 ** scale)
                que = resize_bilinear(que_imgs, (ht, wt))
                s = self.get_scores(que, ref_feats)  # qn,h',w',rfn,3
                _, h_, w_, rfn, _ = s.shape
                s = s.reshape(qn, h_, w_, rfn * 3)
                s = resize_bilinear(s, (hs, ws))
                scores.append(s.reshape(qn, hs, ws, rfn, 3))
        # channel order: scale-major, level-minor (matches torch cat over the
        # stacked level axis, detector.py:245)
        scores = jnp.concatenate(scores, -1)  # qn,hs,ws,rfn,sn*3
        x = nn.relu(self.score_conv0(scores))
        x = self.score_conv1(x)  # qn,hs,ws,rfn,64
        scores_feats = jnp.max(x, axis=3)  # max over ref views (detector.py:247)
        score_map = self.score_predict(scores_feats)  # qn,hs,ws,1
        offset_map = self.offset_predict(scores_feats)  # qn,hs,ws,2
        scale_map = self.scale_predict(scores_feats)  # qn,hs,ws,1
        return {'scores': score_map, 'select_pr_offset': offset_map,
                'select_pr_scale': scale_map, 'pool_ratio': POOL_RATIO}

    def __call__(self, ref_imgs, que_imgs):
        """Training forward (detector.py:268-275)."""
        ref_feats = self.load_ref(ref_imgs)
        return self.detect(que_imgs, ref_feats)


def parse_detection(score_map, scale_map, offset_map, pool_ratio=POOL_RATIO):
    """Decode heads -> (positions (qn,2) in px, scales_r2q (qn,)).

    Matches parse_detection (detector.py:97-121): argmax cell + offset,
    (p+0.5)*ratio-0.5 to pixels, scale = 2**scale_pr.
    """
    qn, h, w, _ = score_map.shape
    flat = score_map[..., 0].reshape(qn, h * w)
    idx = jnp.argmax(flat, axis=1)
    yy = idx // w
    xx = idx % w
    qi = jnp.arange(qn)
    offset = offset_map[qi, yy, xx]  # qn,2
    positions = jnp.stack([xx, yy], -1).astype(jnp.float32) + offset
    positions = (positions + 0.5) * pool_ratio - 0.5
    scales = 2.0 ** scale_map[qi, yy, xx, 0]
    return positions, scales
