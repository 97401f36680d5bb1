"""Volume refiner (Flax, channel-last): 32^3 feature-volume pose refinement.

Port of reference network/refiner.py:16-269 as one batched XLA program:
- the unproject-and-sample (perspective project + grid_sample per ref view,
  refiner.py:184-206) is a vmapped bilinear gather (gen6d_tpu.ops.sampling);
- the 3D CNN runs NDHWC on TPU; stride-2 convs use torch padding=1 semantics;
- mean/std over reference views use torch's unbiased std (refiner.py:237).

The network itself is pure; the inference-side wrapper that re-selects and
re-warps reference views per iteration lives in gen6d_tpu.pipeline.estimator
(device-resident, lax.scan over refine iterations).
"""
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from gen6d_tpu.models.layers import instance_norm, l2_normalize, leaky_relu_01
from gen6d_tpu.models.vgg import VGG11BN
from gen6d_tpu.ops.image import resize_bilinear
from gen6d_tpu.ops.sampling import sample_bilinear_dense


def _in2d(x):
    return instance_norm(x, spatial_axes=(1, 2))


def _in3d(x):
    return instance_norm(x, spatial_axes=(1, 2, 3))


class RefineFeatureNet(nn.Module):
    """Frozen VGG (strides 4/8/16) + trainable fusion -> 128-ch feats at 1/4
    (refiner.py:16-78). ``train_feats`` unfreezes the VGG (needed for
    from-scratch training — no pretrained weights in this environment)."""
    dtype: object = None
    train_feats: bool = False

    @nn.compact
    def __call__(self, imgs):
        # ImageNet normalization is folded into the backbone's first conv
        x0, x1, x2 = VGG11BN(outputs=('s4', 's8', 's16'), name='backbone',
                             dtype=self.dtype)(imgs)
        sg = (lambda x: x) if self.train_feats else lax.stop_gradient
        x0 = sg(l2_normalize(x0, -1))
        x1 = sg(l2_normalize(x1, -1))
        x2 = sg(l2_normalize(x2, -1))

        def block(x, mid, name):
            x = nn.Conv(mid, (3, 3), padding=1, name=f'{name}_0',
                        dtype=self.dtype)(x)
            x = _in2d(x)
            x = nn.relu(x)
            x = nn.Conv(64, (3, 3), padding=1, name=f'{name}_1',
                        dtype=self.dtype)(x)
            return _in2d(x)

        y0 = block(x0, 64, 'conv0')
        y1 = block(x1, 256, 'conv1')
        y2 = block(x2, 256, 'conv2')
        h, w = y0.shape[1], y0.shape[2]
        y1 = resize_bilinear(y1, (h, w))
        y2 = resize_bilinear(y2, (h, w))
        y = jnp.concatenate([y0, y1, y2], -1)
        y = nn.Conv(128, (3, 3), padding=1, name='conv_out_0',
                    dtype=self.dtype)(y)
        y = _in2d(y)
        y = nn.relu(y)
        y = nn.Conv(128, (3, 3), padding=1, name='conv_out_1',
                    dtype=self.dtype)(y)
        return _in2d(y)


class RefineVolumeEncodingNet(nn.Module):
    """3D CNN 32^3 -> 4^3 x 512 (refiner.py:80-143). Input NDHWC."""
    dtype: object = None

    @nn.compact
    def __call__(self, mean, var):
        def conv3(f, s, name):
            return nn.Conv(f, (3, 3, 3), strides=(s, s, s), padding=1,
                           name=name, dtype=self.dtype)

        m = conv3(64, 1, 'mean_embed_0')(mean)
        m = _in3d(m)
        m = nn.relu(m)
        m = conv3(64, 1, 'mean_embed_1')(m)
        v = conv3(64, 1, 'var_embed_0')(var)
        v = _in3d(v)
        v = nn.relu(v)
        v = conv3(64, 1, 'var_embed_1')(v)
        x = jnp.concatenate([m, v], -1)

        x = nn.relu(_in3d(conv3(64, 1, 'conv0')(x)))        # 32
        x = nn.relu(_in3d(conv3(128, 2, 'conv1')(x)))
        x = nn.relu(_in3d(conv3(128, 1, 'conv2')(x)))       # 16
        x = nn.relu(_in3d(conv3(256, 2, 'conv3')(x)))
        x = nn.relu(_in3d(conv3(256, 1, 'conv4')(x)))       # 8
        x = nn.relu(_in3d(conv3(512, 2, 'conv5_0')(x)))
        x = conv3(512, 1, 'conv5_1')(x)                      # 4
        return x.astype(jnp.float32)


class RefineRegressor(nn.Module):
    """MLP -> (quat, 2D offset, log-scale) (refiner.py:153-166)."""

    @nn.compact
    def __call__(self, x):
        x = leaky_relu_01(nn.Dense(512, name='fc0')(x))
        x = leaky_relu_01(nn.Dense(512, name='fc1')(x))
        r = l2_normalize(nn.Dense(4, name='fcr')(x), axis=1)
        t = nn.Dense(2, name='fct')(x)
        s = nn.Dense(1, name='fcs')(x)
        return r, t, s


def interpolate_volume_feats(feats, verts, proj):
    """Project volume vertices into a view and bilinear-sample its features.

    feats: (h,w,f); verts: (pn,3); proj: (3,4) = K @ pose ->
    (pn,f). Matches interpolate_volume_feats (refiner.py:184-206) incl. the
    depth clamp at 1e-4.
    """
    cam = verts @ proj[:, :3].T + proj[:, 3]
    depth = jnp.maximum(cam[:, 2:], 1e-4)
    xy = cam[:, :2] / depth
    # dense MXU formulation: the 32x32 maps make gather-based sampling
    # HBM-bound; see ops/sampling.py:sample_bilinear_dense
    return sample_bilinear_dense(feats, xy, accum_dtype=feats.dtype)


class VolumeRefiner(nn.Module):
    cfg: Any = None
    dtype: Any = None
    # Pallas fused sampling kernels. False selects the XLA gather path (also
    # the CPU fallback).
    fast_volume: bool = True
    # use the custom-VJP-wrapped kernels (needed when differentiating; the
    # wrapper costs some fusion in the big inference program)
    grad_kernels: bool = False

    @property
    def sample_num(self):
        return (self.cfg or {}).get('refiner_sample_num', 32)

    def setup(self):
        self.feature_net = RefineFeatureNet(
            dtype=self.dtype,
            train_feats=(self.cfg or {}).get('train_feats', False))
        self.volume_net = RefineVolumeEncodingNet(dtype=self.dtype)
        self.regressor = RefineRegressor()

    def __call__(self, que_imgs, que_Ks_in, que_poses_in, ref_imgs, ref_poses,
                 ref_Ks):
        """que_imgs: (qn,h,w,3); que_Ks_in/que_poses_in: (qn,3,3)/(qn,3,4);
        ref_imgs: (qn,rfn,h,w,3); ref_poses/ref_Ks: (qn,rfn,3,4)/(qn,rfn,3,3)
        -> dict(rotation (qn,4), offset (qn,2), scale (qn,1), grids).

        Matches construct_feature_volume + forward (refiner.py:208-269).
        """
        sn = self.sample_num
        qn = que_imgs.shape[0]
        rfn = ref_imgs.shape[1]

        # volume grid on [-1,1]^3, rotated by the input pose (refiner.py:211-222)
        lin = jnp.linspace(-1.0, 1.0, sn)
        grid = jnp.stack(jnp.meshgrid(lin, lin, lin, indexing='ij'), -1)
        grid = grid.reshape(1, sn ** 3, 3)
        vol_coords = grid @ que_poses_in[:, :3, :3]  # qn,sn^3,3 (object frame)

        # reference-view features and volume sampling
        ref_feats = self.feature_net(ref_imgs.reshape(qn * rfn, *ref_imgs.shape[2:]))
        ref_feats = ref_feats.reshape(qn, rfn, *ref_feats.shape[1:])
        ref_proj = (ref_Ks @ ref_poses).astype(jnp.float32)  # qn,rfn,3,4

        if self.fast_volume and jax.default_backend() != 'cpu':
            # fused Pallas unproject-sample-reduce (ops/volume_pallas.py);
            # grad_kernels selects the custom-VJP wrappers for training
            from gen6d_tpu.ops import volume_pallas as vp
            ms = vp.volume_sample_meanstd_grad if self.grad_kernels \
                else vp.volume_sample_meanstd
            ss = vp.volume_sample_single_grad if self.grad_kernels \
                else vp.volume_sample_single
            mean, std = jax.vmap(ms)(ref_feats.astype(jnp.float32), ref_proj,
                                     vol_coords)
            que_feats = self.feature_net(que_imgs)
            que_proj = (que_Ks_in @ que_poses_in).astype(jnp.float32)
            vol_feats_in = jax.vmap(ss)(que_feats.astype(jnp.float32), que_proj,
                                        vol_coords)
        else:
            def sample_one(feats, proj, verts):
                return interpolate_volume_feats(feats, verts, proj)

            vol_feats = jax.vmap(jax.vmap(sample_one, in_axes=(0, 0, None)),
                                 in_axes=(0, 0, 0))(ref_feats, ref_proj,
                                                    vol_coords)
            vol_feats = vol_feats.astype(jnp.float32)
            mean = jnp.mean(vol_feats, 1)
            # unbiased std (refiner.py:237) with an epsilon inside the sqrt:
            # volume points outside every view sample exactly 0 in all views,
            # var == 0, and sqrt'(0) = inf NaNs the gradients at step 1
            var = jnp.sum((vol_feats - mean[:, None]) ** 2, 1) / (rfn - 1)
            std = jnp.sqrt(var + 1e-12)

            que_feats = self.feature_net(que_imgs)
            que_proj = que_Ks_in @ que_poses_in
            vol_feats_in = jax.vmap(sample_one)(que_feats, que_proj, vol_coords)

        f = mean.shape[-1]
        mean_in = jnp.concatenate([mean, vol_feats_in], -1).reshape(qn, sn, sn, sn, 2 * f)
        std = std.reshape(qn, sn, sn, sn, f)
        enc = self.volume_net(mean_in, std)  # qn,4,4,4,512
        # flatten channel-major to match the torch regressor weight layout
        enc = jnp.transpose(enc, (0, 4, 1, 2, 3)).reshape(qn, -1)
        rotation, offset, scale = self.regressor(enc)
        return {'rotation': rotation, 'offset': offset, 'scale': scale,
                'vol_coords': vol_coords}
