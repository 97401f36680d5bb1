"""Convert reference PyTorch checkpoints (estimator.py:121 `model_best.pth`
state dicts) into Flax parameter trees for the gen6d_tpu models.

Torch layouts -> Flax layouts:
- Conv2d  (O,I,kh,kw)     -> kernel (kh,kw,I,O)
- Conv3d  (O,I,kd,kh,kw)  -> kernel (kd,kh,kw,I,O)
- Conv1d/Conv2d/Conv3d with 1x..x1 kernels and Linear -> Dense kernel (I,O)
- BatchNorm -> FrozenBatchNorm {scale,bias,mean,var}

The regressor's flattened-volume Dense needs no permutation: the Flax refiner
transposes the volume encoding to channel-major before flattening
(models/refiner.py).
"""
import numpy as np


def _np(t):
    """torch tensor or ndarray -> float32 ndarray."""
    if hasattr(t, 'detach'):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def conv2d(sd, key):
    return {'kernel': _np(sd[f'{key}.weight']).transpose(2, 3, 1, 0),
            'bias': _np(sd[f'{key}.bias'])}


def conv3d(sd, key):
    return {'kernel': _np(sd[f'{key}.weight']).transpose(2, 3, 4, 1, 0),
            'bias': _np(sd[f'{key}.bias'])}


def dense(sd, key):
    """Linear or any 1x..x1 conv -> Dense."""
    w = _np(sd[f'{key}.weight'])
    w = w.reshape(w.shape[0], -1)  # squeeze kernel dims
    return {'kernel': w.T, 'bias': _np(sd[f'{key}.bias'])}


def bn(sd, key):
    return {'scale': _np(sd[f'{key}.weight']),
            'bias': _np(sd[f'{key}.bias']),
            'mean': _np(sd[f'{key}.running_mean']),
            'var': _np(sd[f'{key}.running_var'])}


def layernorm(sd, key):
    return {'scale': _np(sd[f'{key}.weight']), 'bias': _np(sd[f'{key}.bias'])}


# torchvision vgg11_bn features indices -> VGG11BN stage names (vgg.py)
VGG_LAYERS = [
    (0, 1, 'stage0_0'), (4, 5, 'stage1_0'),
    (8, 9, 'stage2_0'), (11, 12, 'stage2_1'),
    (15, 16, 'stage3_0'), (18, 19, 'stage3_1'),
    (22, 23, 'stage4_0'), (25, 26, 'stage4_1'),
]


def convert_vgg(sd, prefix='backbone'):
    """torch `<prefix>.features.{i}` -> VGG11BN params, with the torchvision
    Normalize(mean,std) folded into stage0's conv (the gen6d_tpu models feed
    raw [0,1] images; see models/vgg.py:fold_imagenet_normalization)."""
    from gen6d_tpu.models.vgg import fold_imagenet_normalization
    out = {}
    for ci, bi, name in VGG_LAYERS:
        out[name] = {'conv': conv2d(sd, f'{prefix}.features.{ci}'),
                     'bn': bn(sd, f'{prefix}.features.{bi}')}
    return fold_imagenet_normalization(out)


def convert_detector(sd):
    """Reference Detector state dict (network/detector.py:136-185) -> params."""
    return {'params': {
        'backbone': convert_vgg(sd, 'backbone'),
        'score_conv0': dense(sd, 'score_conv.0'),
        'score_conv1': dense(sd, 'score_conv.2'),
        'score_predict': {'conv0': conv2d(sd, 'score_predict.0'),
                          'conv1': conv2d(sd, 'score_predict.2'),
                          'conv2': conv2d(sd, 'score_predict.4')},
        'scale_predict': {'conv0': conv2d(sd, 'scale_predict.0'),
                          'conv1': conv2d(sd, 'scale_predict.2'),
                          'conv2': conv2d(sd, 'scale_predict.4')},
        'offset_predict': {'conv0': conv2d(sd, 'offset_predict.0'),
                           'conv1': conv2d(sd, 'offset_predict.2'),
                           'conv2': conv2d(sd, 'offset_predict.4')},
    }}


# conv indices inside the reference's corr_conv Sequentials (selector.py:27-68);
# InstanceNorm3d(affine=False) layers hold no params
_CORR_CONV_IDX = {0: (1, 4, 7, 10, 13, 16), 1: (1, 4, 7, 10), 2: (1, 4)}


def convert_selector(sd):
    """Reference ViewpointSelector state dict (network/selector.py:12-111)."""
    p = {'backbone': convert_vgg(sd, 'backbone')}
    for level, idxs in _CORR_CONV_IDX.items():
        p[f'corr_conv{level}'] = {
            f'c{j}': {'conv': conv3d(sd, f'corr_conv_list.{level}.{i}')}
            for j, i in enumerate(idxs)}
    p['corr_feats_conv0'] = dense(sd, 'corr_feats_conv.0')
    p['corr_feats_conv1'] = dense(sd, 'corr_feats_conv.3')
    p['score_process0'] = dense(sd, 'score_process.0')
    p['score_process1'] = dense(sd, 'score_process.2')
    for i in range(2):
        p[f'att{i}'] = {
            'conv_query': dense(sd, f'atts.{i}.conv_query'),
            'conv_key': dense(sd, f'atts.{i}.conv_key'),
            'conv_feats': dense(sd, f'atts.{i}.conv_feats'),
            'conv_merge': dense(sd, f'atts.{i}.conv_merge'),
            'norm': layernorm(sd, f'atts.{i}.norm.norm'),
        }
        p[f'mlp{i}_0'] = dense(sd, f'mlps.{i}.0')
        p[f'mlp{i}_1'] = dense(sd, f'mlps.{i}.3')
    p['score_predict0'] = dense(sd, 'score_predict.0')
    p['score_predict1'] = dense(sd, 'score_predict.2')
    p['angle_predict0'] = dense(sd, 'angle_predict.0')
    p['angle_predict1'] = dense(sd, 'angle_predict.2')
    p['angle_predict2'] = dense(sd, 'angle_predict.4')
    p['vp_enc0'] = dense(sd, 'view_point_encoder.0')
    p['vp_enc1'] = dense(sd, 'view_point_encoder.2')
    p['vp_enc2'] = dense(sd, 'view_point_encoder.4')
    return {'params': p}


def convert_refiner(sd):
    """Reference VolumeRefiner state dict (network/refiner.py:16-177)."""
    fn = {'backbone': convert_vgg(sd, 'feature_net.backbone')}
    for name in ('conv0', 'conv1', 'conv2', 'conv_out'):
        fn[f'{name}_0'] = conv2d(sd, f'feature_net.{name}.0')
        fn[f'{name}_1'] = conv2d(sd, f'feature_net.{name}.3')
    vn = {}
    for name in ('mean_embed', 'var_embed'):
        vn[f'{name}_0'] = conv3d(sd, f'volume_net.{name}.0')
        vn[f'{name}_1'] = conv3d(sd, f'volume_net.{name}.3')
    for name in ('conv0', 'conv1', 'conv2', 'conv3', 'conv4'):
        vn[name] = conv3d(sd, f'volume_net.{name}.0')
    vn['conv5_0'] = conv3d(sd, 'volume_net.conv5.0')
    vn['conv5_1'] = conv3d(sd, 'volume_net.conv5.3')
    reg = {'fc0': dense(sd, 'regressor.fc.0.0'),
           'fc1': dense(sd, 'regressor.fc.1.0'),
           'fcr': dense(sd, 'regressor.fcr'),
           'fct': dense(sd, 'regressor.fct'),
           'fcs': dense(sd, 'regressor.fcs')}
    return {'params': {'feature_net': fn, 'volume_net': vn, 'regressor': reg}}


def convert_resnet18(sd, prefix='', fold_normalization=True):
    """torchvision resnet18 state dict -> ResNet18 params (models/resnet.py;
    reference ResNet18Pretrain, pretrain_models.py:113-195). Resnet convs are
    bias-free, so entries carry only 'kernel'."""
    from gen6d_tpu.models.resnet import fold_imagenet_normalization_resnet
    pre = f'{prefix}.' if prefix else ''

    def conv_nb(key):
        return {'kernel': _np(sd[f'{pre}{key}.weight']).transpose(2, 3, 1, 0)}

    p = {'conv1': conv_nb('conv1'), 'bn1': bn(sd, f'{pre}bn1')}
    for li in range(1, 5):
        for bi in range(2):
            blk = {'conv1': conv_nb(f'layer{li}.{bi}.conv1'),
                   'bn1': bn(sd, f'{pre}layer{li}.{bi}.bn1'),
                   'conv2': conv_nb(f'layer{li}.{bi}.conv2'),
                   'bn2': bn(sd, f'{pre}layer{li}.{bi}.bn2')}
            if f'{pre}layer{li}.{bi}.downsample.0.weight' in sd:
                blk['down_conv'] = conv_nb(f'layer{li}.{bi}.downsample.0')
                blk['down_bn'] = bn(sd, f'{pre}layer{li}.{bi}.downsample.1')
            p[f'layer{li}_{bi}'] = blk
    if fold_normalization:
        p = fold_imagenet_normalization_resnet(p)
    return {'params': p}


def load_torch_checkpoint(path):
    """Load a reference `model_best.pth` and return its network_state_dict."""
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    if 'network_state_dict' in ckpt:
        return ckpt['network_state_dict']
    return ckpt


name2converter = {
    'detector': convert_detector,
    'selector': convert_selector,
    'refiner': convert_refiner,
}
