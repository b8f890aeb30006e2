'''
Test-only helper that imports the *reference* PyTorch TCOW model (read-only at
/root/reference) to serve as a golden oracle for numerical parity tests.

This module is never imported by the framework itself — only by tests, and only when the
reference checkout is present. fvcore (absent in this image) is stubbed out; only the
registry/path-manager surface the vendored package touches at import time is provided.
'''

import os
import sys
import types

REFERENCE_TIMESFORMER = '/root/reference/third_party/TimeSformer'


def _stub(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


class _Registry:
    def __init__(self, name):
        self._name = name
        self._obj_map = {}

    def register(self, obj=None):
        def deco(o):
            self._obj_map[o.__name__] = o
            return o
        return deco(obj) if obj is not None and not isinstance(obj, str) else deco

    def get(self, name):
        return self._obj_map[name]


def import_reference_timesformer():
    '''Returns the vendored `timesformer.models.vit` module, stubbing fvcore.'''
    if 'fvcore' not in sys.modules:
        _stub('fvcore')
        _stub('fvcore.common')
        _stub('fvcore.common.file_io', PathManager=object)
        _stub('fvcore.common.registry', Registry=_Registry)
        nn_mod = _stub('fvcore.nn')
        nn_mod.__path__ = []
        _stub('fvcore.nn.weight_init', c2_msra_fill=lambda *a, **k: None)
        _stub('fvcore.nn.flop_count', flop_count=lambda *a, **k: ({}, {}))
        _stub('fvcore.nn.activation_count', activation_count=lambda *a, **k: ({}, {}))
        _stub('fvcore.nn.precise_bn', get_bn_modules=lambda *a, **k: [],
              update_bn_stats=lambda *a, **k: None)
    if REFERENCE_TIMESFORMER not in sys.path:
        sys.path.insert(0, REFERENCE_TIMESFORMER)
    import timesformer.models.vit as ref_vit
    return ref_vit


def _stub_reference_runtime_deps():
    '''Stubs the reference's import-time dependencies that are absent in this image:
    lovely_numpy/lovely_tensors (debug pretty-printers), torchvision (only ToTensor is
    instantiated on the pipeline path), timm (only used for pretrained downloads).'''
    if 'timm' not in sys.modules:
        _stub('timm')
    if 'lovely_numpy' not in sys.modules:
        _stub('lovely_numpy', lo=lambda x, *a, **k: x)
    if 'lovely_tensors' not in sys.modules:
        _stub('lovely_tensors', monkey_patch=lambda *a, **k: None,
              lovely=lambda x, *a, **k: x)
    if 'torchvision' not in sys.modules:
        class _ToTensor:
            def __call__(self, x):
                raise NotImplementedError('torchvision stub')
        tv = _stub('torchvision')
        tv.__path__ = []
        for sub in ('datasets', 'io', 'models', 'utils'):
            _stub(f'torchvision.{sub}')
            setattr(tv, sub, sys.modules[f'torchvision.{sub}'])
        tr = _stub('torchvision.transforms', ToTensor=_ToTensor)
        fn = _stub('torchvision.transforms.functional',
                   gaussian_blur=_gaussian_blur_torch)
        tr.functional = fn
        tv.transforms = tr


def _gaussian_blur_torch(img, kernel_size, sigma):
    '''torchvision.transforms.functional.gaussian_blur semantics for tensors: normalized
    separable gaussian kernel, reflect padding, depthwise conv2d (used by the reference's
    hard-negative band, loss.py:136-146).'''
    import torch
    import torch.nn.functional as F
    kx, ky = (kernel_size, kernel_size) if isinstance(kernel_size, int) else kernel_size
    if isinstance(sigma, (int, float)):
        sx = sy = float(sigma)
    else:
        sx, sy = (float(sigma[0]), float(sigma[-1]))

    def k1d(k, s):
        half = (k - 1) * 0.5
        x = torch.linspace(-half, half, steps=k)
        pdf = torch.exp(-0.5 * (x / s) ** 2)
        return pdf / pdf.sum()

    orig_dtype = img.dtype
    x = img if torch.is_floating_point(img) else img.to(torch.float32)
    kernel2d = torch.outer(k1d(ky, sy), k1d(kx, sx)).to(x.dtype)
    shape = x.shape
    x = x.reshape(1, -1, shape[-2], shape[-1])
    C = x.shape[1]
    weight = kernel2d.expand(C, 1, ky, kx)
    x = F.pad(x, [kx // 2, kx // 2, ky // 2, ky // 2], mode='reflect')
    x = F.conv2d(x, weight, groups=C).reshape(shape)
    if not torch.is_floating_point(img):
        x = x.round().to(orig_dtype)
    return x


class FakeRefLogger:
    '''Minimal logger duck-type for the reference pipeline/loss classes.'''

    def info(self, *a, **k):
        pass

    debug = warning = error = info

    def report_scalar(self, *a, **k):
        pass


def import_reference_pipeline():
    '''Imports the reference's ACTUAL pipeline/loss/metrics/data_utils/seeker modules
    (flat layout rooted at /root/reference with sys.path side-loading, __init__.py:61-66).
    Returns a namespace object with the imported modules.'''
    import_reference_timesformer()  # fvcore stub + third_party on sys.path
    _stub_reference_runtime_deps()
    ref_root = os.path.dirname(REFERENCE_TIMESFORMER.rstrip('/'))
    ref_root = os.path.dirname(ref_root)  # /root/reference
    for sub in ('', 'data', 'eval', 'model', 'utils'):
        p = os.path.join(ref_root, sub) if sub else ref_root
        if p not in sys.path:
            sys.path.insert(0, p)
    import pipeline as ref_pipeline
    import loss as ref_loss
    import metrics as ref_metrics
    import data_utils as ref_data_utils
    import my_utils as ref_my_utils
    import seeker as ref_seeker
    ns = types.SimpleNamespace(
        pipeline=ref_pipeline, loss=ref_loss, metrics=ref_metrics,
        data_utils=ref_data_utils, my_utils=ref_my_utils, seeker=ref_seeker)
    return ns


def make_reference_backbone(frame_height, frame_width, patch_size, in_channels, num_frames,
                            attention_type, causal_attention, network_depth):
    '''Constructs the vendored TimeSformer with drop_path disabled for deterministic eval.'''
    ref_vit = import_reference_timesformer()
    model = ref_vit.TimeSformer(
        img_size=(frame_height, frame_width), patch_size=patch_size, num_classes=0,
        num_frames=num_frames, attention_type=attention_type,
        causal_attention=causal_attention, drop_path_rate=0.0,
        network_depth=network_depth, pretrained=False, in_chans=in_channels)
    model.eval()
    return model


def reference_dense_forward(model, pixels_torch, causal_attention, norm_embeddings=False):
    '''Reimplements the dense forward of /root/reference/model/vision_tf.py:68-169 on top of
    the vendored model, without the input normalization (tests feed pre-normalized data).

    :param pixels_torch (B, C, T, H, W) torch tensor.
    :return (features (B, D, T, H', W') torch, cls (B, D) torch).
    '''
    import torch
    from einops import rearrange
    m = model.model
    B, C, T, H, W = pixels_torch.shape
    with torch.no_grad():
        x, T2, W2 = m.patch_embed(pixels_torch)
        cls_tokens = m.cls_token.expand(x.size(0), -1, -1)
        x = torch.cat((cls_tokens, x), dim=1)
        assert x.size(1) == m.pos_embed.size(1), 'test shapes must match constructed model'
        x = x + m.pos_embed
        cls_tokens = x[:B, 0, :].unsqueeze(1)
        x = x[:, 1:]
        x = rearrange(x, '(b t) n m -> (b n) t m', b=B, t=T)
        assert T == m.time_embed.size(1)
        x = x + m.time_embed
        x = rearrange(x, '(b n) t m -> b (n t) m', b=B, t=T)
        x = torch.cat((cls_tokens, x), dim=1)
        y = x
        for blk in m.blocks:
            y = blk(y, B, T, W2)
        if norm_embeddings:
            y = m.norm(y)
        cls_out = y[:, 0, :]
        y = y[:, 1:]
        y = rearrange(y, 'B (H W T) D -> B D T H W', B=B, T=T,
                      H=H // m.patch_embed.patch_size[0], W=W2, D=m.embed_dim)
    return y, cls_out
