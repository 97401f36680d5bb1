"""Model-layer golden tests vs torch CPU, plus converter structural tests
against the reference checkpoint key/shape format."""
import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from gen6d_tpu.models import convert as C
from gen6d_tpu.models.attention import AttentionBlock
from gen6d_tpu.models.detector import Detector, correlate, parse_detection
from gen6d_tpu.models.layers import (FrozenBatchNorm, instance_norm,
                                     l2_normalize, leaky_relu_01)
from gen6d_tpu.models.refiner import VolumeRefiner, interpolate_volume_feats
from gen6d_tpu.models.selector import ViewpointSelector
from gen6d_tpu.models.vgg import VGG11BN


def torch_vgg11_bn_features():
    """Standard torchvision vgg11_bn feature stack (cfg 'A')."""
    cfg = [64, 'M', 128, 'M', 256, 256, 'M', 512, 512, 'M', 512, 512, 'M']
    layers, in_ch = [], 3
    for v in cfg:
        if v == 'M':
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(in_ch, v, 3, padding=1), nn.BatchNorm2d(v),
                       nn.ReLU(inplace=True)]
            in_ch = v
    return nn.Sequential(*layers)


def randomize_bn_stats(m, rng):
    for mod in m.modules():
        if isinstance(mod, nn.BatchNorm2d):
            mod.running_mean.copy_(torch.from_numpy(rng.randn(mod.num_features).astype(np.float32)))
            mod.running_var.copy_(torch.from_numpy(rng.rand(mod.num_features).astype(np.float32) + 0.5))


@pytest.mark.slow
class TestVGG:
    def test_pyramid_matches_torch(self, rng):
        """Full VGG-11-BN pyramid vs torch, incl. the stage-split quirk: the
        stride-16 output ends at BN without ReLU (pretrain_models.py:110)."""
        t = torch_vgg11_bn_features().eval()
        with torch.no_grad():
            randomize_bn_stats(t, rng)
        sd = {f'backbone.features.{k}': v for k, v in t.state_dict().items()}
        params = {'params': C.convert_vgg(sd, 'backbone')}

        img = rng.rand(2, 64, 64, 3).astype(np.float32)
        model = VGG11BN(outputs=('s4', 's8', 's16', 's32'))
        # converter folds ImageNet normalization into stage0; feed raw [0,1]
        outs = model.apply(params, jnp.asarray(img))

        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        x = torch.from_numpy(((img - mean) / std).transpose(0, 3, 1, 2).astype(np.float32))
        with torch.no_grad():
            h = t[0:14](x)       # -> stride 4
            t4 = h
            h = t[14:21](h)      # -> stride 8
            t8 = h
            h = t[21:27](h)      # -> stride 16, ends at bn (no relu)
            t16 = h
            t32 = t[28](F.relu(h)) if False else t[28](h)  # features[-1] on x1
        for ours, ref, name in [(outs[0], t4, 's4'), (outs[1], t8, 's8'),
                                (outs[2], t16, 's16'), (outs[3], t32, 's32')]:
            ref = ref.numpy().transpose(0, 2, 3, 1)
            np.testing.assert_allclose(np.array(ours), ref, atol=2e-4,
                                       err_msg=name)


class TestLayers:
    def test_frozen_bn(self, rng):
        bn = nn.BatchNorm2d(8).eval()
        with torch.no_grad():
            bn.weight.copy_(torch.from_numpy(rng.randn(8).astype(np.float32)))
            bn.bias.copy_(torch.from_numpy(rng.randn(8).astype(np.float32)))
            bn.running_mean.copy_(torch.from_numpy(rng.randn(8).astype(np.float32)))
            bn.running_var.copy_(torch.from_numpy((rng.rand(8) + 0.5).astype(np.float32)))
        x = rng.rand(2, 5, 6, 8).astype(np.float32)
        params = {'params': C.bn({f'b.{k}': v for k, v in bn.state_dict().items()}, 'b')}
        ours = FrozenBatchNorm(8).apply(params, jnp.asarray(x))
        with torch.no_grad():
            ref = bn(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.array(ours), ref, atol=1e-5)

    def test_instance_norm_2d3d(self, rng):
        x = rng.rand(2, 6, 5, 4, 8).astype(np.float32)  # n,d,h,w,c
        ours = np.array(instance_norm(jnp.asarray(x), spatial_axes=(1, 2, 3)))
        t = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))
        ref = F.instance_norm(t).numpy().transpose(0, 2, 3, 4, 1)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

        x2 = rng.rand(2, 7, 9, 3).astype(np.float32)
        ours2 = np.array(instance_norm(jnp.asarray(x2), spatial_axes=(1, 2)))
        ref2 = F.instance_norm(torch.from_numpy(x2.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours2, ref2, atol=1e-5)

    def test_l2_normalize(self, rng):
        x = rng.randn(4, 16).astype(np.float32)
        ours = np.array(l2_normalize(jnp.asarray(x), axis=1))
        ref = F.normalize(torch.from_numpy(x), dim=1).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_leaky_relu(self, rng):
        x = rng.randn(100).astype(np.float32)
        np.testing.assert_allclose(np.array(leaky_relu_01(jnp.asarray(x))),
                                   F.leaky_relu(torch.from_numpy(x), 0.1).numpy(),
                                   atol=1e-7)


class TestCorrelation:
    def test_correlate_matches_conv2d(self, rng):
        """The detector's ref-as-filter correlation (detector.py:222-224)."""
        que = rng.rand(2, 20, 24, 16).astype(np.float32)
        ref = rng.rand(6, 7, 7, 16).astype(np.float32)
        ours = np.array(correlate(jnp.asarray(que), jnp.asarray(ref), 3))
        ref_t = torch.from_numpy(ref.transpose(0, 3, 1, 2))
        que_t = torch.from_numpy(que.transpose(0, 3, 1, 2))
        expected = F.conv2d(que_t, ref_t, padding=3).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-3)


class TestAttention:
    def test_attention_block_vs_manual(self, rng):
        """AttentionBlock vs an independent per-head numpy computation with the
        reference's head-fastest channel split (attention.py:60-65)."""
        b, n, f, heads = 2, 6, 16, 4
        feats = rng.randn(b, n, f).astype(np.float32)
        blk = AttentionBlock(f, f, f, heads, skip_connect=False, norm='layer')
        params = blk.init(jax.random.PRNGKey(0), jnp.asarray(feats), jnp.asarray(feats))
        out = np.array(blk.apply(params, jnp.asarray(feats), jnp.asarray(feats)))

        p = jax.tree.map(np.asarray, params['params'])
        q = feats @ p['conv_query']['kernel'] + p['conv_query']['bias']
        k = feats @ p['conv_key']['kernel'] + p['conv_key']['bias']
        v = feats @ p['conv_feats']['kernel'] + p['conv_feats']['bias']
        had = f // heads
        expected = np.zeros((b, n, f), np.float32)
        for bi in range(b):
            for h in range(heads):
                # channel c = d*heads + h (head axis fastest)
                qs = q[bi][:, h::heads]
                ks = k[bi][:, h::heads]
                vs = v[bi][:, h::heads]
                sc = qs @ ks.T / np.sqrt(had)
                pr = np.exp(sc - sc.max(-1, keepdims=True))
                pr = pr / pr.sum(-1, keepdims=True)
                expected[bi][:, h::heads] = pr @ vs
        expected = expected @ p['conv_merge']['kernel'] + p['conv_merge']['bias']
        mu = expected.mean(-1, keepdims=True)
        sd = expected.std(-1, keepdims=True)
        expected = (expected - mu) / np.sqrt(sd ** 2 + 1e-6)
        expected = expected * p['norm']['scale'] + p['norm']['bias']
        np.testing.assert_allclose(out, expected, atol=1e-4)


@pytest.mark.slow
class TestVolumeSampling:
    def test_matches_torch_grid_sample_pipeline(self, rng):
        """interpolate_volume_feats vs the reference's project+normalize+
        grid_sample chain (refiner.py:184-206)."""
        feats = rng.rand(16, 20, 8).astype(np.float32)
        verts = (rng.rand(50, 3).astype(np.float32) - 0.5) * 2
        K = np.array([[30.0, 0, 10], [0, 30, 8], [0, 0, 1]], np.float32)
        pose = np.concatenate([np.eye(3), np.array([[0.1], [0.2], [3.0]])], 1).astype(np.float32)
        proj = K @ pose
        ours = np.array(interpolate_volume_feats(jnp.asarray(feats), jnp.asarray(verts),
                                                 jnp.asarray(proj)))
        # torch path
        cam = verts @ proj[:, :3].T + proj[:, 3]
        depth = np.maximum(cam[:, 2:], 1e-4)
        xy = cam[:, :2] / depth
        h, w = feats.shape[:2]
        norm = ((xy + 0.5) / np.array([w, h]) * 2 - 1).astype(np.float32)
        t_feats = torch.from_numpy(feats.transpose(2, 0, 1))[None]
        grid = torch.from_numpy(norm)[None, None]
        ref = F.grid_sample(t_feats, grid, mode='bilinear', align_corners=False)
        ref = ref[0, :, 0].numpy().T
        np.testing.assert_allclose(ours, ref, atol=1e-4)


def _fake_torch_sd(shapes, rng):
    return {k: torch.from_numpy(rng.randn(*s).astype(np.float32) * 0.05)
            for k, s in shapes.items()}


def _vgg_shapes(prefix):
    shapes = {}
    convs = {0: (64, 3), 4: (128, 64), 8: (256, 128), 11: (256, 256),
             15: (512, 256), 18: (512, 512), 22: (512, 512), 25: (512, 512)}
    for ci, (o, i) in convs.items():
        shapes[f'{prefix}.features.{ci}.weight'] = (o, i, 3, 3)
        shapes[f'{prefix}.features.{ci}.bias'] = (o,)
        for stat in ('weight', 'bias', 'running_mean', 'running_var'):
            shapes[f'{prefix}.features.{ci + 1}.{stat}'] = (o,)
    return shapes


def _seq_shapes(prefix, dims, kernel):
    """Conv stack shapes: dims = [(idx, out, in), ...]"""
    shapes = {}
    for idx, o, i in dims:
        shapes[f'{prefix}.{idx}.weight'] = (o, i) + kernel
        shapes[f'{prefix}.{idx}.bias'] = (o,)
    return shapes


@pytest.mark.slow
class TestConverters:
    """Converted reference-format state dicts must load into the Flax models
    with exactly matching tree structure and shapes."""

    def _check(self, model_init_params, converted):
        flat_a = jax.tree_util.tree_flatten_with_path(model_init_params)[0]
        flat_b = jax.tree_util.tree_flatten_with_path(converted)[0]
        keys_a = {jax.tree_util.keystr(k): v.shape for k, v in flat_a}
        keys_b = {jax.tree_util.keystr(k): np.asarray(v).shape for k, v in flat_b}
        assert keys_a == keys_b

    def test_detector(self, rng):
        shapes = _vgg_shapes('backbone')
        shapes.update(_seq_shapes('score_conv', [(0, 64, 12), (2, 64, 64)], (1, 1, 1)))
        for head, od in [('score_predict', 1), ('scale_predict', 1), ('offset_predict', 2)]:
            shapes.update(_seq_shapes(head, [(0, 64, 64), (2, 64, 64), (4, od, 64)], (3, 3)))
        sd = _fake_torch_sd(shapes, rng)
        converted = C.convert_detector(sd)
        det = Detector()
        init = det.init(jax.random.PRNGKey(0), jnp.zeros((2, 128, 128, 3)),
                        jnp.zeros((1, 128, 128, 3)))
        self._check(init, converted)

    def test_selector(self, rng):
        shapes = _vgg_shapes('backbone')
        shapes.update(_seq_shapes('corr_conv_list.0',
                                  [(1, 64, 512), (4, 64, 64), (7, 128, 64),
                                   (10, 128, 128), (13, 256, 128), (16, 256, 256)],
                                  (1, 3, 3)))
        shapes.update(_seq_shapes('corr_conv_list.1',
                                  [(1, 128, 512), (4, 128, 128), (7, 256, 128),
                                   (10, 256, 256)], (1, 3, 3)))
        shapes.update(_seq_shapes('corr_conv_list.2',
                                  [(1, 256, 512), (4, 256, 256)], (1, 3, 3)))
        shapes.update(_seq_shapes('corr_feats_conv', [(0, 512, 768), (3, 512, 512)],
                                  (1, 1, 1)))
        shapes.update(_seq_shapes('score_process', [(0, 512, 515), (2, 512, 512)],
                                  (1, 1)))
        for i in range(2):
            for nm in ('conv_query', 'conv_key', 'conv_feats', 'conv_merge'):
                shapes[f'atts.{i}.{nm}.weight'] = (512, 512, 1)
                shapes[f'atts.{i}.{nm}.bias'] = (512,)
            shapes[f'atts.{i}.norm.norm.weight'] = (512,)
            shapes[f'atts.{i}.norm.norm.bias'] = (512,)
            shapes.update(_seq_shapes(f'mlps.{i}', [(0, 512, 1024), (3, 512, 512)],
                                      (1,)))
        shapes.update(_seq_shapes('score_predict', [(0, 512, 512), (2, 1, 512)], (1,)))
        shapes.update(_seq_shapes('angle_predict',
                                  [(0, 512, 515 * 5), (2, 512, 512), (4, 1, 512)],
                                  (1,)))
        shapes['view_point_encoder.0.weight'] = (128, 3)
        shapes['view_point_encoder.0.bias'] = (128,)
        shapes['view_point_encoder.2.weight'] = (256, 128)
        shapes['view_point_encoder.2.bias'] = (256,)
        shapes['view_point_encoder.4.weight'] = (512, 256)
        shapes['view_point_encoder.4.bias'] = (512,)
        sd = _fake_torch_sd(shapes, rng)
        converted = C.convert_selector(sd)
        sel = ViewpointSelector()
        poses = jnp.tile(jnp.eye(3, 4)[None], (3, 1, 1)).at[:, 2, 3].set(3.0)
        init = sel.init(jax.random.PRNGKey(0), jnp.zeros((5, 3, 128, 128, 3)),
                        poses, jnp.zeros(3), jnp.asarray([0.0, 0, 1]),
                        jnp.zeros((1, 128, 128, 3)))
        self._check(init, converted)

    def test_refiner(self, rng):
        shapes = _vgg_shapes('feature_net.backbone')
        shapes.update(_seq_shapes('feature_net.conv0', [(0, 64, 256), (3, 64, 64)], (3, 3)))
        shapes.update(_seq_shapes('feature_net.conv1', [(0, 256, 512), (3, 64, 256)], (3, 3)))
        shapes.update(_seq_shapes('feature_net.conv2', [(0, 256, 512), (3, 64, 256)], (3, 3)))
        shapes.update(_seq_shapes('feature_net.conv_out', [(0, 128, 192), (3, 128, 128)], (3, 3)))
        shapes.update(_seq_shapes('volume_net.mean_embed', [(0, 64, 256), (3, 64, 64)], (3, 3, 3)))
        shapes.update(_seq_shapes('volume_net.var_embed', [(0, 64, 128), (3, 64, 64)], (3, 3, 3)))
        shapes.update(_seq_shapes('volume_net.conv0', [(0, 64, 128)], (3, 3, 3)))
        shapes.update(_seq_shapes('volume_net.conv1', [(0, 128, 64)], (3, 3, 3)))
        shapes.update(_seq_shapes('volume_net.conv2', [(0, 128, 128)], (3, 3, 3)))
        shapes.update(_seq_shapes('volume_net.conv3', [(0, 256, 128)], (3, 3, 3)))
        shapes.update(_seq_shapes('volume_net.conv4', [(0, 256, 256)], (3, 3, 3)))
        shapes.update(_seq_shapes('volume_net.conv5', [(0, 512, 256), (3, 512, 512)], (3, 3, 3)))
        shapes['regressor.fc.0.0.weight'] = (512, 512 * 64)
        shapes['regressor.fc.0.0.bias'] = (512,)
        shapes['regressor.fc.1.0.weight'] = (512, 512)
        shapes['regressor.fc.1.0.bias'] = (512,)
        for nm, o in [('fcr', 4), ('fct', 2), ('fcs', 1)]:
            shapes[f'regressor.{nm}.weight'] = (o, 512)
            shapes[f'regressor.{nm}.bias'] = (o,)
        sd = _fake_torch_sd(shapes, rng)
        converted = C.convert_refiner(sd)
        refiner = VolumeRefiner()
        K = jnp.tile(jnp.asarray([[100.0, 0, 64], [0, 100, 64], [0, 0, 1]])[None], (1, 1, 1))
        pose = jnp.tile(jnp.eye(3, 4)[None], (1, 1, 1)).at[:, 2, 3].set(3.0)
        init = refiner.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)), K,
                            pose, jnp.zeros((1, 2, 128, 128, 3)),
                            jnp.tile(pose[:, None], (1, 2, 1, 1)),
                            jnp.tile(K[:, None], (1, 2, 1, 1)))
        self._check(init, converted)


class TestParseDetection:
    def test_decode(self, rng):
        score = np.full((1, 10, 12, 1), -5.0, np.float32)
        score[0, 4, 7, 0] = 3.0
        offset = np.zeros((1, 10, 12, 2), np.float32)
        offset[0, 4, 7] = [0.25, -0.5]
        scale = np.zeros((1, 10, 12, 1), np.float32)
        scale[0, 4, 7, 0] = 1.0
        pos, sc = parse_detection(jnp.asarray(score), jnp.asarray(scale),
                                  jnp.asarray(offset))
        np.testing.assert_allclose(np.array(pos)[0],
                                   [(7 + 0.25 + 0.5) * 8 - 0.5, (4 - 0.5 + 0.5) * 8 - 0.5])
        assert float(sc[0]) == pytest.approx(2.0)


@pytest.mark.slow
class TestParityHarness:
    """The real-checkpoint parity harness (scripts/parity.py): synthesized
    reference-layout state dicts must convert into trees that exactly match
    the Flax init structure, and produce the stored golden activations."""

    def test_structural_and_deterministic(self):
        # NB: cross-process golden comparison lives in the standalone script
        # (`python scripts/parity.py --check-goldens`): XLA CPU accumulation
        # order depends on the host thread split, and the test conftest's
        # 8-virtual-device env differs from the script's default env.
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            'parity', os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), 'scripts', 'parity.py'))
        parity = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(parity)
        for kind in ('detector', 'selector'):
            sd = parity.synth_state_dict(kind)
            params = parity.convert_and_verify(kind, sd)  # structural check
            o1 = parity._run(kind, params)
            o2 = parity._run(kind, params)
            for k in o1:
                np.testing.assert_array_equal(o1[k], o2[k])


def torch_resnet18_trunk():
    """torchvision resnet18 trunk (conv1..layer4) with torchvision's exact
    state-dict keys, hand-built (torchvision is not in this env; structure
    per reference pretrain_models.py:113-195)."""

    class Basic(nn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False),
                    nn.BatchNorm2d(cout))

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            y = F.relu(self.bn1(self.conv1(x)))
            return F.relu(self.bn2(self.conv2(y)) + idn)

    class Trunk(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = nn.Sequential(Basic(64, 64), Basic(64, 64))
            self.layer2 = nn.Sequential(Basic(64, 128, 2), Basic(128, 128))
            self.layer3 = nn.Sequential(Basic(128, 256, 2), Basic(256, 256))
            self.layer4 = nn.Sequential(Basic(256, 512, 2), Basic(512, 512))

        def forward(self, x):
            x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
            outs = []
            for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
                x = layer(x)
                outs.append(x)
            return outs

    return Trunk()


@pytest.mark.slow
class TestResNet18:
    def test_pyramid_matches_torch(self, rng):
        """ResNet-18 pyramid vs torch at all four strides, through the
        converter (incl. folded ImageNet normalization and the -inf-padded
        3x3/2 maxpool)."""
        from gen6d_tpu.models.resnet import ResNet18
        from gen6d_tpu.models.vgg import IMAGENET_MEAN, IMAGENET_STD

        t = torch_resnet18_trunk().eval()
        with torch.no_grad():
            randomize_bn_stats(t, rng)
        params = C.convert_resnet18(t.state_dict())

        img = rng.rand(2, 64, 96, 3).astype(np.float32)
        x_t = torch.from_numpy(
            ((img - IMAGENET_MEAN) / IMAGENET_STD).transpose(0, 3, 1, 2)
            .astype(np.float32))
        with torch.no_grad():
            refs = [o.numpy().transpose(0, 2, 3, 1) for o in t(x_t)]

        net = ResNet18(outputs=('s4', 's8', 's16', 's32'))
        outs = jax.jit(net.apply)(params, jnp.asarray(img))
        for o, r in zip(outs, refs):
            assert o.shape == r.shape
            np.testing.assert_allclose(np.asarray(o), r, atol=2e-4)


class TestSharedPyramid:
    """The shared detect pyramid (detector cfg shared_pyramid): one backbone
    pass + per-scale feature/filter resizing instead of one VGG sweep per
    detection scale (reference network/detector.py:232-243)."""

    def test_scale0_exact_match(self):
        """With detection_scales=[0.0] the pyramid path IS the per-scale
        computation — exact golden anchor (no resizing happens)."""
        cfg = {'detection_scales': (0.0,), 'score_norm': 'adaptive'}
        det0 = Detector(cfg)
        det1 = Detector({**cfg, 'shared_pyramid': True})
        key = jax.random.PRNGKey(0)
        ref = jax.random.uniform(key, (3, 128, 128, 3))
        que = jax.random.uniform(jax.random.fold_in(key, 1), (2, 64, 96, 3))
        params = det0.init(key, ref, que)  # shared_pyramid adds no params
        out0 = jax.jit(det0.apply)(params, ref, que)
        out1 = jax.jit(det1.apply)(params, ref, que)
        for k in ('scores', 'select_pr_scale', 'select_pr_offset'):
            np.testing.assert_allclose(out1[k], out0[k], atol=1e-5, err_msg=k)

    def test_four_scale_reference_operating_point(self):
        """4 reference scales incl. +0.5 (filter-resized bank): correct head
        shapes, finite outputs, and a ref cache with the extra '+0.5' bank."""
        det = Detector({'detection_scales': (-1.0, -0.5, 0.0, 0.5),
                        'score_norm': 'adaptive', 'shared_pyramid': True})
        key = jax.random.PRNGKey(1)
        ref = jax.random.uniform(key, (3, 128, 128, 3))
        que = jax.random.uniform(jax.random.fold_in(key, 1), (2, 64, 96, 3))
        params = det.init(key, ref, que)
        cache = jax.jit(lambda p, r: det.apply(p, r, method='load_ref'))(
            params, ref)
        assert set(cache.keys()) == {'base', '+0.5'}
        # filters downsampled 2^-0.5 and forced odd: 15->11, 7->5, 3->3
        assert [f.shape[1] for f in cache['+0.5']] == [11, 5, 3]
        out = jax.jit(lambda p, q, c: det.apply(p, q, c, method='detect'))(
            params, que, cache)
        assert out['scores'].shape == (2, 8, 12, 1)
        assert out['select_pr_offset'].shape == (2, 8, 12, 2)
        for k in ('scores', 'select_pr_scale', 'select_pr_offset'):
            assert np.all(np.isfinite(np.asarray(out[k]))), k
