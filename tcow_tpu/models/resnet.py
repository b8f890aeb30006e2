'''
Dense ResNet-50 feature extractor (alternative spatial backbone).

Reimplements /root/reference/model/resnet.py:25-99: a ResNet-50 truncated after layer3
(output dim 1024, stride 16) used as a dense per-frame feature extractor, with the first
convolution swapped out when the input has != 3 channels (resnet.py:54-58). The reference
builds it from timm (unavailable offline); this is a from-scratch functional JAX ResNet-50
(v1.5: stride-2 on the 3x3 of downsampling bottlenecks).

The reference never instantiates this backbone in the default configuration
(mask_tracker.py uses the TimeSformer exclusively; SURVEY.md section 7.4) — it exists for
architecture experiments. BatchNorm here uses batch statistics at train time and the stored
running statistics at eval time; running stats are updated by the caller via the returned
batch moments (functional style).
'''

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

# Bottleneck counts for layers 1-3 of ResNet-50 (layer4 truncated).
BLOCK_COUNTS = (3, 4, 6)
STAGE_WIDTHS = (256, 512, 1024)


@dataclasses.dataclass(frozen=True)
class DenseResNetConfig:
    in_channels: int = 3
    compute_dtype: Any = jnp.float32

    @property
    def output_feature_dim(self) -> int:
        return STAGE_WIDTHS[-1]  # 1024 at stride 16


def _conv_init(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    std = np.sqrt(2.0 / fan_in)
    return jax.random.normal(key, (kh, kw, cin, cout)) * std


def _bn_init(c):
    return {'g': jnp.ones((c,)), 'b': jnp.zeros((c,)),
            'mean': jnp.zeros((c,)), 'var': jnp.ones((c,))}


def init_params(key: jax.Array, cfg: DenseResNetConfig) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 64))
    params = {
        'stem': {'conv': _conv_init(next(keys), 7, 7, cfg.in_channels, 64),
                 'bn': _bn_init(64)},
        'layers': [],
    }
    cin = 64
    for stage, (n_blocks, width) in enumerate(zip(BLOCK_COUNTS, STAGE_WIDTHS)):
        mid = width // 4
        blocks = []
        for b in range(n_blocks):
            stride = 2 if (b == 0 and stage > 0) else 1
            block = {
                'conv1': _conv_init(next(keys), 1, 1, cin, mid), 'bn1': _bn_init(mid),
                'conv2': _conv_init(next(keys), 3, 3, mid, mid), 'bn2': _bn_init(mid),
                'conv3': _conv_init(next(keys), 1, 1, mid, width), 'bn3': _bn_init(width),
            }
            if b == 0:
                block['down_conv'] = _conv_init(next(keys), 1, 1, cin, width)
                block['down_bn'] = _bn_init(width)
            blocks.append(block)
            cin = width
        params['layers'].append(blocks)
    return params


def _bn(x, p, train: bool, eps: float = 1e-5):
    if train:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
    else:
        mean, var = p['mean'], p['var']
    inv = jax.lax.rsqrt(var + eps) * p['g']
    return (x - mean) * inv + p['b']


def _conv(x, w, stride: int = 1):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def _bottleneck(x, p, stride: int, train: bool):
    y = jax.nn.relu(_bn(_conv(x, p['conv1']), p['bn1'], train))
    y = jax.nn.relu(_bn(_conv(y, p['conv2'], stride), p['bn2'], train))
    y = _bn(_conv(y, p['conv3']), p['bn3'], train)
    if 'down_conv' in p:
        x = _bn(_conv(x, p['down_conv'], stride), p['down_bn'], train)
    return jax.nn.relu(x + y)


def forward(params: Dict[str, Any], cfg: DenseResNetConfig, frames: jnp.ndarray,
            train: bool = False) -> jnp.ndarray:
    '''
    :param frames (B, C, H, W) float.
    :return features (B, 1024, H/16, W/16) — dim/stride contract of resnet.py:25-99.
    '''
    x = frames.astype(cfg.compute_dtype).transpose(0, 2, 3, 1)  # NHWC
    x = _conv(x, params['stem']['conv'], stride=2)
    x = jax.nn.relu(_bn(x, params['stem']['bn'], train))
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), 'SAME')
    for stage, blocks in enumerate(params['layers']):
        for b, block in enumerate(blocks):
            stride = 2 if (b == 0 and stage > 0) else 1
            x = _bottleneck(x, block, stride, train)
    return x.transpose(0, 3, 1, 2)  # (B, 1024, H/16, W/16)


def import_torch_resnet50(state_dict, cfg: DenseResNetConfig) -> Dict[str, Any]:
    '''Converts a torchvision/timm resnet50 state dict into this pytree, applying the
    first-conv channel adaptation when cfg.in_channels != 3 (repeat + rescale, mirroring
    helpers.py:147-150 semantics used for the ViT patch embed).'''
    def t(name):
        import numpy as _np
        v = state_dict[name]
        return _np.asarray(v.detach().cpu().numpy() if hasattr(v, 'detach') else v)

    def conv(name):
        w = t(name)  # torch (O, I, kh, kw) -> (kh, kw, I, O)
        return jnp.asarray(w.transpose(2, 3, 1, 0))

    def bn(prefix):
        return {'g': jnp.asarray(t(prefix + '.weight')),
                'b': jnp.asarray(t(prefix + '.bias')),
                'mean': jnp.asarray(t(prefix + '.running_mean')),
                'var': jnp.asarray(t(prefix + '.running_var'))}

    stem_w = t('conv1.weight')
    if cfg.in_channels != 3:
        rep = -(-cfg.in_channels // 3)
        stem_w = np.tile(stem_w, (1, rep, 1, 1))[:, :cfg.in_channels] \
            * (3.0 / cfg.in_channels)
    params = {'stem': {'conv': jnp.asarray(stem_w.transpose(2, 3, 1, 0)),
                       'bn': bn('bn1')},
              'layers': []}
    for stage in range(3):
        blocks = []
        for b in range(BLOCK_COUNTS[stage]):
            pre = f'layer{stage + 1}.{b}'
            block = {'conv1': conv(pre + '.conv1.weight'), 'bn1': bn(pre + '.bn1'),
                     'conv2': conv(pre + '.conv2.weight'), 'bn2': bn(pre + '.bn2'),
                     'conv3': conv(pre + '.conv3.weight'), 'bn3': bn(pre + '.bn3')}
            if b == 0:
                block['down_conv'] = conv(pre + '.downsample.0.weight')
                block['down_bn'] = bn(pre + '.downsample.1')
            blocks.append(block)
        params['layers'].append(blocks)
    return params
