"""Viewpoint selector (Flax, channel-last): scores 64 ref views x 5 in-plane
angles against the query crop, runs attention over views, regresses the
residual in-plane angle.

Port of reference network/selector.py:12-226 as ONE batched XLA program over
all (rfn x an) views. Layout notes:
- correlation tensors are (qn, D=rfn*an, h, w, f) — NDHWC; the reference's
  Conv3d(f, f', (1,3,3)) (selector.py:27-69) is a 3D conv with kernel 1 on the
  view axis, so views never mix inside corr convs;
- InstanceNorm3d normalizes each (sample, channel) over ALL of (rfn*an, h, w)
  jointly (this couples views; under view-axis sharding it needs a psum);
- Conv1d(k=1) == Dense over channels.
"""
from typing import Any

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from gen6d_tpu.models.attention import AttentionBlock
from gen6d_tpu.models.layers import instance_norm, l2_normalize
from gen6d_tpu.models.vgg import VGG11BN


class Conv3dViewwise(nn.Module):
    """nn.Conv3d(in, out, (1,3,3), padding=(0,1,1)) on (qn, D, h, w, c)."""
    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (1, 3, 3),
                       padding=((0, 0), (1, 1), (1, 1)), name='conv',
                       dtype=self.dtype)(x)


def _max_pool_hw(x):
    """MaxPool3d((1,2,2),(1,2,2)) on (qn,D,h,w,c)."""
    return nn.max_pool(x, (1, 2, 2), strides=(1, 2, 2))


def _in3d(x):
    """InstanceNorm3d(affine=False) on (qn,D,h,w,c): normalize over (D,h,w)."""
    return instance_norm(x, spatial_axes=(1, 2, 3))


class CorrConv0(nn.Module):
    dtype: object = None
    """corr_conv for pyramid level 0 (selector.py:27-47): 512->64->64 /pool/
    ->128->128 /pool/ ->256->256, with instance norms."""

    @nn.compact
    def __call__(self, x):
        x = _in3d(x)
        x = Conv3dViewwise(64, name='c0', dtype=self.dtype)(x)
        x = _in3d(x)
        x = nn.relu(x)
        x = Conv3dViewwise(64, name='c1', dtype=self.dtype)(x)
        x = _in3d(x)
        x = _max_pool_hw(x)
        x = Conv3dViewwise(128, name='c2', dtype=self.dtype)(x)
        x = _in3d(x)
        x = nn.relu(x)
        x = Conv3dViewwise(128, name='c3', dtype=self.dtype)(x)
        x = _in3d(x)
        x = _max_pool_hw(x)
        x = Conv3dViewwise(256, name='c4', dtype=self.dtype)(x)
        x = _in3d(x)
        x = nn.relu(x)
        x = Conv3dViewwise(256, name='c5', dtype=self.dtype)(x)
        return x


class CorrConv1(nn.Module):
    dtype: object = None
    """corr_conv for level 1 (selector.py:48-61)."""

    @nn.compact
    def __call__(self, x):
        x = _in3d(x)
        x = Conv3dViewwise(128, name='c0', dtype=self.dtype)(x)
        x = _in3d(x)
        x = nn.relu(x)
        x = Conv3dViewwise(128, name='c1', dtype=self.dtype)(x)
        x = _in3d(x)
        x = _max_pool_hw(x)
        x = Conv3dViewwise(256, name='c2', dtype=self.dtype)(x)
        x = _in3d(x)
        x = nn.relu(x)
        x = Conv3dViewwise(256, name='c3', dtype=self.dtype)(x)
        return x


class CorrConv2(nn.Module):
    dtype: object = None
    """corr_conv for level 2 (selector.py:62-68)."""

    @nn.compact
    def __call__(self, x):
        x = _in3d(x)
        x = Conv3dViewwise(256, name='c0', dtype=self.dtype)(x)
        x = _in3d(x)
        x = nn.relu(x)
        x = Conv3dViewwise(256, name='c1', dtype=self.dtype)(x)
        return x


class ViewpointSelector(nn.Module):
    cfg: Any = None
    dtype: Any = None

    @property
    def angle_num(self):
        return (self.cfg or {}).get('selector_angle_num', 5)

    def setup(self):
        self.backbone = VGG11BN(outputs=('s8', 's16', 's32'),
                                dtype=self.dtype)
        self.corr_conv0 = CorrConv0(dtype=self.dtype)
        self.corr_conv1 = CorrConv1(dtype=self.dtype)
        self.corr_conv2 = CorrConv2(dtype=self.dtype)
        # corr_feats_conv (selector.py:71-77): Conv3d 1x1x1 == Dense; AvgPool(1,4,4)
        self.corr_feats_conv0 = nn.Dense(512, dtype=self.dtype)
        self.corr_feats_conv1 = nn.Dense(512, dtype=self.dtype)
        # score_process (selector.py:79-83): Conv2d 1x1 == Dense
        self.score_process0 = nn.Dense(512)
        self.score_process1 = nn.Dense(512)
        self.atts = [AttentionBlock(512, 512, 512, 8, skip_connect=False,
                                    name=f'att{i}') for i in range(2)]
        # mlps (selector.py:86-87): Conv1d(1024->512), IN, relu, Conv1d(512->512), IN, relu
        self.mlp_dense = [(nn.Dense(512, name=f'mlp{i}_0'),
                           nn.Dense(512, name=f'mlp{i}_1')) for i in range(2)]
        self.score_predict0 = nn.Dense(512)
        self.score_predict1 = nn.Dense(1)
        self.angle_predict0 = nn.Dense(512)
        self.angle_predict1 = nn.Dense(512)
        self.angle_predict2 = nn.Dense(1)
        # view_point_encoder (selector.py:105-111)
        self.vp_enc0 = nn.Dense(128)
        self.vp_enc1 = nn.Dense(256)
        self.vp_enc2 = nn.Dense(512)

    def get_feats(self, imgs):
        """imgs (n,h,w,3) [0,1] -> 3 L2-normalized pyramid feats
        (selector.py:113-119). Frozen unless cfg['train_feats'] (needed for
        from-scratch training — no pretrained weights in this environment)."""
        # ImageNet normalization is folded into the backbone's first conv
        feats = self.backbone(imgs)
        if (self.cfg or {}).get('train_feats', False):
            return tuple(l2_normalize(f, axis=-1) for f in feats)
        return tuple(lax.stop_gradient(l2_normalize(f, axis=-1)) for f in feats)

    def encode_viewpoints(self, ref_poses, object_center, object_vert,
                          forward_idx=0):
        """Viewpoint embedding of the reference cameras (selector.py:132-148).

        ref_poses: (rfn,3,4) -> (rfn,512). ``forward_idx`` picks the camera that
        defines the azimuth origin (index 0 at eval; random in training).
        """
        ref_cam_pts = (-jnp.swapaxes(ref_poses[:, :3, :3], -1, -2)
                       @ ref_poses[:, :3, 3:])[..., 0] - object_center[None]
        object_forward = ref_cam_pts[forward_idx]
        y = jnp.cross(object_vert, object_forward)
        x = jnp.cross(y, object_vert)
        vert_n = l2_normalize(object_vert, axis=0)
        x = l2_normalize(x, axis=0)
        y = l2_normalize(y, axis=0)
        R = jnp.stack([x, y, vert_n], 0)
        pts = l2_normalize(ref_cam_pts @ R.T, axis=1)
        h = nn.relu(self.vp_enc0(pts))
        h = nn.relu(self.vp_enc1(h))
        return self.vp_enc2(h)

    def load_ref(self, ref_imgs, ref_poses, object_center, object_vert,
                 forward_idx=0):
        """ref_imgs: (an,rfn,h,w,3) -> (per-level feats (an,rfn,h,w,f)...,
        pose_embed (rfn,512)). Matches extract_ref_feats (selector.py:121-148)."""
        an, rfn, h, w, _ = ref_imgs.shape
        feats = self.get_feats(ref_imgs.reshape(an * rfn, h, w, 3))
        feats = tuple(f.reshape(an, rfn, f.shape[1], f.shape[2], f.shape[3])
                      for f in feats)
        embed = self.encode_viewpoints(ref_poses, object_center, object_vert,
                                       forward_idx)
        return feats, embed

    def select(self, que_imgs, ref_feats, ref_pose_embed):
        """que_imgs: (qn,128,128,3) -> (logits (qn,rfn), angles (qn,rfn)).

        Matches compute_view_point_feats (selector.py:177-215).
        """
        que_feats_list = self.get_feats(que_imgs)
        corr_convs = (self.corr_conv0, self.corr_conv1, self.corr_conv2)
        an = ref_feats[0].shape[0]
        rfn = ref_feats[0].shape[1]
        qn = que_imgs.shape[0]

        vps_feats, corr_feats = [], []
        for ref_f, que_f, conv in zip(ref_feats, que_feats_list, corr_convs):
            # (qn,rfn,an,h,w,f): elementwise correlation (selector.py:184)
            fc = que_f[:, None, None] * jnp.transpose(ref_f, (1, 0, 2, 3, 4))[None]
            _, _, _, h, w, f = fc.shape
            fc = fc.reshape(qn, rfn * an, h, w, f)
            out = conv(fc)
            h_, w_, f_ = out.shape[2], out.shape[3], out.shape[4]
            corr_feats.append(out.reshape(qn, rfn, an, h_, w_, f_))

            # handcrafted score-map statistics (selector.py:192-195), f32
            score_maps = jnp.sum(fc.astype(jnp.float32), -1)  # qn,rfn*an,h,w
            peak = jnp.max(score_maps.reshape(qn, rfn * an, h * w), -1)
            score_maps_ = score_maps / peak[..., None, None]
            score_vps = jnp.sum((score_maps * score_maps_).reshape(qn, rfn * an, -1), -1)
            vps_feats.append(score_vps.reshape(qn, rfn, an))

        corr_feats = jnp.concatenate(corr_feats, -1)  # qn,rfn,an,h_,w_,3*256
        # corr_feats_conv + global 4x4 avg pool (selector.py:197-200)
        x = nn.relu(_in3d(self.corr_feats_conv0(
            corr_feats.reshape(qn, rfn * an, *corr_feats.shape[3:]))))
        x = self.corr_feats_conv1(x)
        x = jnp.mean(x.astype(jnp.float32), axis=(2, 3))  # AvgPool3d (1,4,4)
        corr_feats = x.reshape(qn, rfn, an, 512)

        # vp_norm: InstanceNorm2d(3) over (rfn,an) per stat channel (selector.py:201)
        vps = jnp.stack(vps_feats, -1)  # qn,rfn,an,3
        vps = instance_norm(vps, spatial_axes=(1, 2))
        feats = jnp.concatenate([corr_feats, vps], -1)  # qn,rfn,an,515

        x = nn.relu(self.score_process0(feats))
        x = self.score_process1(x)
        scores_feats = jnp.max(x, axis=2)  # max over angles (selector.py:204)
        scores_feats = scores_feats + ref_pose_embed[None]  # qn,rfn,512

        for att, (m0, m1) in zip(self.atts, self.mlp_dense):
            msg = att(scores_feats, scores_feats)
            y = jnp.concatenate([scores_feats, msg], -1)
            y = nn.relu(instance_norm(m0(y), spatial_axes=(1,)))
            y = nn.relu(instance_norm(m1(y), spatial_axes=(1,)))
            scores_feats = y + scores_feats
        logits = self.score_predict1(nn.relu(self.score_predict0(scores_feats)))[..., 0]

        # angle head over (f+3)*an channels, f-major (selector.py:212-214)
        af = jnp.swapaxes(feats, 2, 3).reshape(qn, rfn, -1)  # qn,rfn,(515*an)
        a = nn.relu(self.angle_predict0(af))
        a = nn.relu(self.angle_predict1(a))
        angles = self.angle_predict2(a)[..., 0]  # qn,rfn
        return logits, angles

    def __call__(self, ref_imgs, ref_poses, object_center, object_vert,
                 que_imgs, forward_idx=0):
        """Training forward (selector.py:217-226)."""
        ref_feats, embed = self.load_ref(ref_imgs, ref_poses, object_center,
                                         object_vert, forward_idx)
        logits, angles = self.select(que_imgs, ref_feats, embed)
        return {'ref_vp_logits': logits, 'angles_pr': angles}
