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
