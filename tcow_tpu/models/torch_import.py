'''
PyTorch checkpoint import: converts reference TCOW checkpoints (and ImageNet ViT weights) into
this package's JAX parameter pytrees.

Reproduces the reference's weight-loading semantics:
  - TCOW checkpoints are dicts with `net_seeker` / `train_args` / `seeker_args` / `epoch` keys
    (/root/reference/train.py:269-304, eval/inference.py:19-57);
  - ImageNet ViT inflation rules (/root/reference/third_party/TimeSformer/timesformer/models/
    helpers.py:100-205): first-conv channel inflation (repeat ceil(C/3) times, slice to C,
    scale by 3/C), 1-D nearest resize of pos_embed (non-cls part) and time_embed, and copying
    spatial attn/norm1 weights into temporal_attn/temporal_norm1 when absent.

Torch is used only on the host for deserialization; everything returned is numpy/jnp.
'''

import math
from typing import Any, Dict, Tuple

import numpy as np

from tcow_tpu.models.mask_tracker import SeekerConfig


def _to_np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, 'detach') else np.asarray(t)


def load_torch_file(path: str) -> Dict[str, Any]:
    import torch
    return torch.load(path, map_location='cpu', weights_only=False)


def _nearest_resize_axis(arr: np.ndarray, new_len: int, axis: int) -> np.ndarray:
    n_in = arr.shape[axis]
    if n_in == new_len:
        return arr
    idx = np.floor(np.arange(new_len) * n_in / new_len).astype(np.int64)
    return np.take(arr, idx, axis=axis)


def _linear(sd, name) -> Dict[str, np.ndarray]:
    # torch Linear weight is (out, in); ours is (in, out).
    return {'w': _to_np(sd[name + '.weight']).T.astype(np.float32),
            'b': _to_np(sd[name + '.bias']).astype(np.float32)}


def _ln(sd, name) -> Dict[str, np.ndarray]:
    return {'g': _to_np(sd[name + '.weight']).astype(np.float32),
            'b': _to_np(sd[name + '.bias']).astype(np.float32)}


def backbone_params_from_torch(sd: Dict[str, Any], cfg, prefix: str = '') -> Dict[str, Any]:
    '''Converts a vendored-VisionTransformer state dict (keys like `blocks.0.attn.qkv.weight`)
    into the stacked-blocks pytree used by tcow_tpu.models.timesformer.

    :param sd state dict (torch tensors or numpy arrays).
    :param cfg TimeSformerConfig.
    :param prefix key prefix inside sd (e.g. 'tracker_backbone.timesformer.model.').
    '''
    g = lambda k: sd[prefix + k]
    D = cfg.embed_dim

    conv_w = _to_np(g('patch_embed.proj.weight')).astype(np.float32)  # (D, C, p, p)
    _, C, p, _ = conv_w.shape
    assert C == cfg.in_channels and p == cfg.patch_size, (conv_w.shape, cfg)
    # Our patch vector layout is (ph, pw, C); see timesformer.forward.
    pe_w = conv_w.transpose(2, 3, 1, 0).reshape(p * p * C, D)

    pos = _to_np(g('pos_embed')).astype(np.float32)[0]   # (N+1, D)
    time = _to_np(g('time_embed')).astype(np.float32)[0]  # (T, D)

    params = {
        'patch_embed': {'w': pe_w, 'b': _to_np(g('patch_embed.proj.bias')).astype(np.float32)},
        'cls_token': _to_np(g('cls_token')).astype(np.float32).reshape(D),
        'pos_embed': pos,
        'time_embed': time,
        'norm': _ln(sd, prefix + 'norm'),
    }

    def stack(make_one):
        per_block = [make_one(i) for i in range(cfg.depth)]
        import jax
        return jax.tree_util.tree_map(lambda *xs: np.stack(xs, axis=0), *per_block)

    def one_block(i):
        b = f'blocks.{i}.'
        d = {
            'norm1': _ln(sd, prefix + b + 'norm1'),
            'attn': {'qkv': _linear(sd, prefix + b + 'attn.qkv'),
                     'proj': _linear(sd, prefix + b + 'attn.proj')},
            'norm2': _ln(sd, prefix + b + 'norm2'),
            'mlp': {'fc1': _linear(sd, prefix + b + 'mlp.fc1'),
                    'fc2': _linear(sd, prefix + b + 'mlp.fc2')},
        }
        if cfg.divided:
            d.update({
                'temporal_norm1': _ln(sd, prefix + b + 'temporal_norm1'),
                'temporal_attn': {'qkv': _linear(sd, prefix + b + 'temporal_attn.qkv'),
                                  'proj': _linear(sd, prefix + b + 'temporal_attn.proj')},
                'temporal_fc': _linear(sd, prefix + b + 'temporal_fc'),
            })
        return d

    params['blocks'] = stack(one_block)
    return params


def seeker_params_from_torch(sd: Dict[str, Any], cfg: SeekerConfig,
                             prefix: str = '') -> Dict[str, Any]:
    '''Converts a QueryMaskTracker state dict (optionally wrapped, e.g. keys starting with
    `seeker.` from model/seeker.py) into this package's seeker pytree.'''
    # Normalize away common wrappers.
    keys = list(sd.keys())
    for wrapper in ('module.', 'seeker.'):
        if all(k.startswith(wrapper) for k in keys):
            sd = {k[len(wrapper):]: v for k, v in sd.items()}
            keys = list(sd.keys())
    bb_prefix = prefix + 'tracker_backbone.timesformer.model.'
    params = {
        'backbone': backbone_params_from_torch(sd, cfg.backbone_config(), prefix=bb_prefix),
        'post_linear': _linear(sd, prefix + 'tracker_post_linear'),
    }
    if cfg.flag_channels > 0 and (prefix + 'flag_post_linear.weight') in sd:
        params['flag_linear'] = _linear(sd, prefix + 'flag_post_linear')
    return params


def load_tcow_checkpoint(path: str) -> Tuple[Dict[str, Any], SeekerConfig, Dict[str, Any]]:
    '''Loads a reference-format TCOW checkpoint (.pth) and returns
    (seeker_params, seeker_config, full_checkpoint_dict).

    Checkpoints are self-describing: the stored `seeker_args` rebuild the model exactly
    (eval/inference.py:41-53).'''
    from tcow_tpu.models.mask_tracker import seeker_config_from_args
    ckpt = load_torch_file(path)
    seeker_args = dict(ckpt.get('seeker_args', {}))
    cfg = seeker_config_from_args(seeker_args)
    params = seeker_params_from_torch(ckpt['net_seeker'], cfg)
    return params, cfg, ckpt


# ---------------------------------------------------------------------------
# ImageNet ViT inflation (pretrained bootstrap)
# ---------------------------------------------------------------------------

def inflate_imagenet_vit_state_dict(sd: Dict[str, Any], *, in_chans: int, num_patches: int,
                                    num_frames: int,
                                    attention_type: str = 'divided_space_time'
                                    ) -> Dict[str, np.ndarray]:
    '''Applies the reference's pretrained-inflation rules (helpers.py:136-202) to a plain
    image-ViT state dict (timm vit_base_patch16_224 layout), returning a state dict that
    backbone_params_from_torch can consume directly for a video model.

    Rules reproduced:
      - first conv: repeat channel dim ceil(C/3) times, slice to C, scale by 3/C
        (helpers.py:147-150);
      - pos_embed: nearest 1-D resize of the 196 non-cls tokens to num_patches
        (helpers.py:170-178);
      - time_embed: absent in image ViTs -> leave missing (the video model keeps its random
        init, matching strict=False load, helpers.py:205); if present, nearest-resize;
      - divided attention: copy attn.* -> temporal_attn.*, norm1.* -> temporal_norm1.*
        where missing (helpers.py:186-202). temporal_fc has no pretrained source and keeps
        its init (zeros for blocks > 0).
    '''
    out = {k: _to_np(v).astype(np.float32) for k, v in sd.items()
           if not k.startswith('head.')}

    cw = out['patch_embed.proj.weight']
    if cw.ndim == 2:  # manual patchify layout -> conv layout (vit.py:381-390)
        D = cw.shape[0]
        psz = int(math.isqrt(cw.shape[1] // 3))
        cw = cw.reshape(D, 3, psz, psz)
    if in_chans != cw.shape[1]:
        assert cw.shape[1] == 3, 'only 3-channel sources supported'
        rep = int(math.ceil(in_chans / 3))
        cw = np.tile(cw, (1, rep, 1, 1))[:, :in_chans] * (3.0 / float(in_chans))
    out['patch_embed.proj.weight'] = cw

    pos = out['pos_embed']  # (1, N_src+1, D)
    if pos.shape[1] != num_patches + 1:
        body = _nearest_resize_axis(pos[:, 1:], num_patches, axis=1)
        out['pos_embed'] = np.concatenate([pos[:, 0:1], body], axis=1)

    if 'time_embed' in out and out['time_embed'].shape[1] != num_frames:
        out['time_embed'] = _nearest_resize_axis(out['time_embed'], num_frames, axis=1)

    if attention_type == 'divided_space_time':
        for k in list(out.keys()):
            if k.startswith('blocks.') and '.attn.' in k:
                nk = k.replace('.attn.', '.temporal_attn.')
                out.setdefault(nk, out[k])
            if k.startswith('blocks.') and '.norm1.' in k:
                nk = k.replace('.norm1.', '.temporal_norm1.')
                out.setdefault(nk, out[k])
    return out


def apply_pretrained_to_params(params: Dict[str, Any], inflated_sd: Dict[str, np.ndarray],
                               cfg) -> Dict[str, Any]:
    '''Merges an inflated image-ViT state dict into randomly-initialized backbone params,
    emulating torch's strict=False load: keys absent from the state dict (time_embed,
    temporal_fc) keep their initialization.'''
    return backbone_params_from_torch(_fill_missing(inflated_sd, params, cfg), cfg)


def _fill_missing(sd: Dict[str, np.ndarray], params: Dict[str, Any], cfg
                  ) -> Dict[str, np.ndarray]:
    '''Backfills keys that strict=False would leave at their init values, by exporting them
    from the given (already initialized) params pytree.'''
    sd = dict(sd)
    if 'time_embed' not in sd:
        sd['time_embed'] = np.asarray(params['time_embed'])[None]
    for i in range(cfg.depth):
        base = f'blocks.{i}.temporal_fc'
        if base + '.weight' not in sd and cfg.divided:
            sd[base + '.weight'] = np.asarray(params['blocks']['temporal_fc']['w'][i]).T
            sd[base + '.bias'] = np.asarray(params['blocks']['temporal_fc']['b'][i])
    return sd


def jax_tree_copy(tree):
    import jax
    return jax.tree_util.tree_map(lambda x: x, tree)
