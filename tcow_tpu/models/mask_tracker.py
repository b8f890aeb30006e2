'''
Query-conditioned hierarchical mask tracker (the "seeker").

Functional JAX reimplementation of `/root/reference/model/mask_tracker.py:19-142` and the
trivial wrapper `/root/reference/model/seeker.py:17-25`:

  - the binary query mask is appended as a 4th input channel (mask_tracker.py:48,107-108),
  - the dense backbone produces per-patch features (B, D, T, H', W'),
  - a per-patch linear head D -> C*p*p is folded back into pixel-space logits
    (mask_tracker.py:83-84,113-115),
  - logits are coarsened with an avg-pool of stride `track_map_stride` followed by bilinear
    (align_corners=True) or nearest upsampling (mask_tracker.py:117-132),
  - a flag head (linear D -> F, spatial mean) yields per-frame scalars
    (occluded, contained, occlusion-percentage) (mask_tracker.py:86,134-137).

Output contract (preserved, see SURVEY.md section 2.3):
  forward(input_frames (B,3,T,H,W), query_mask (B,1,T,H,W))
      -> (mask_logits (B,3,T,H,W), flags (B,T,F)).
'''

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tcow_tpu.models import timesformer as tsf


@dataclasses.dataclass(frozen=True)
class SeekerConfig:
    num_total_frames: int = 30
    frame_height: int = 240
    frame_width: int = 320
    patch_size: int = 16
    attention_type: str = 'divided_space_time'
    causal_attention: int = 1
    norm_embeddings: bool = False
    drop_path_rate: float = 0.1
    network_depth: int = 12
    track_map_stride: int = 4
    track_map_resize: str = 'bilinear'  # or 'nearest'
    query_channels: int = 1
    output_channels: int = 3
    flag_channels: int = 3
    pretrained: bool = False  # controls input RGB normalization (vision_tf.py:81-89)
    compute_dtype: Any = jnp.float32
    remat: bool = False  # per-block rematerialization in the backbone
    remat_policy: str = 'full'  # 'full' | 'dots' | 'dots_nb'
    remat_group: int = 1  # blocks per checkpoint region (see TimeSformerConfig)
    use_pallas_attention: bool = False  # fused attention kernels (TPU; best for inference)
    temporal_rope: bool = False  # rotary (relative) time encoding on temporal attention
    rope_time_coords: bool = False  # feed TRUE source-frame timestamps into the rotary
    #   tables (time-calibrated rope): strided/subsampled clips (augs stride doubling,
    #   plugin usage modes) carry their real temporal spacing. Stored in seeker_args so
    #   eval reconstructs the convention from the checkpoint. Requires temporal_rope.
    attention_bwd: str = 'res'  # 'res'|'kernel_qkv'|'kernel_x'|'kernel_x_wg' (ops/pallas_attention.py)
    batch_axis: Any = None  # mesh axis names for DP / sequence / tensor parallelism
    seq_axis: Any = None    # (see timesformer.TimeSformerConfig; model_axis shards block
    model_axis: Any = None  # weights + attention heads, parallel/mesh.py tp_pspec)
    pipe_axis: Any = None   # pipeline parallelism (GPipe schedule over block-stack
    pp_stages: int = 1      # stages, timesformer._gpipe_scan; pp_microbatches=0 means
    pp_microbatches: int = 0  # "= pp_stages")
    pp_manual: bool = False  # manual-pipe variant (timesformer._manual_pipe_scan):
    #   explicit shard_map + ppermute schedule that keeps the fused Pallas attention
    #   usable under PP; requires a (pipe x data)-only mesh.

    @property
    def input_channels(self) -> int:
        return 3 + self.query_channels

    def backbone_config(self) -> tsf.TimeSformerConfig:
        if self.temporal_rope and self.attention_type != 'divided_space_time':
            raise ValueError('temporal_rope requires attention_type=divided_space_time '
                             '(joint attention has no separate temporal axis to rotate)')
        if self.rope_time_coords and not self.temporal_rope:
            raise ValueError('rope_time_coords requires temporal_rope=1 (only the rotary '
                             'encoding consumes per-frame time coordinates)')
        embed_dim, num_heads = tsf.DEPTH_PRESETS[self.network_depth]
        return tsf.TimeSformerConfig(
            frame_height=self.frame_height, frame_width=self.frame_width,
            patch_size=self.patch_size, in_channels=self.input_channels,
            num_frames=self.num_total_frames, depth=self.network_depth,
            embed_dim=embed_dim, num_heads=num_heads,
            attention_type=self.attention_type, causal_attention=self.causal_attention,
            norm_embeddings=self.norm_embeddings, drop_path_rate=self.drop_path_rate,
            normalize_inputs=self.pretrained, compute_dtype=self.compute_dtype,
            remat=self.remat, remat_policy=self.remat_policy,
            remat_group=self.remat_group,
            use_pallas_attention=self.use_pallas_attention,
            attention_bwd=self.attention_bwd, temporal_rope=self.temporal_rope,
            batch_axis=self.batch_axis, seq_axis=self.seq_axis,
            model_axis=self.model_axis, pipe_axis=self.pipe_axis,
            pp_stages=self.pp_stages, pp_microbatches=self.pp_microbatches,
            pp_manual=self.pp_manual)


def seeker_config_from_args(seeker_args: Dict[str, Any], **overrides) -> SeekerConfig:
    '''Builds a SeekerConfig from the reference-style seeker_args dict that train.py embeds in
    checkpoints (/root/reference/train.py:186-206).'''
    tracker_pretrained = seeker_args.get('tracker_pretrained', False)
    if isinstance(tracker_pretrained, str):
        pretrained = tracker_pretrained.lower() in ('1', 'y', 'yes', 't', 'true') \
            or len(tracker_pretrained) > 5
    else:
        pretrained = bool(tracker_pretrained)
    kw = dict(
        num_total_frames=seeker_args.get('num_total_frames', 30),
        frame_height=seeker_args.get('frame_height', 240),
        frame_width=seeker_args.get('frame_width', 320),
        patch_size=seeker_args.get('patch_size', 16),
        attention_type=seeker_args.get('attention_type', 'divided_space_time'),
        causal_attention=int(seeker_args.get('causal_attention', 0)),
        norm_embeddings=bool(seeker_args.get('norm_embeddings', False)),
        drop_path_rate=float(seeker_args.get('drop_path_rate', 0.1)),
        network_depth=int(seeker_args.get('network_depth', 12)),
        track_map_stride=int(seeker_args.get('track_map_stride', 4)),
        track_map_resize=seeker_args.get('track_map_resize', 'bilinear'),
        query_channels=int(seeker_args.get('query_channels', 1)),
        output_channels=int(seeker_args.get('output_channels', 3)),
        flag_channels=int(seeker_args.get('flag_channels', 3)),
        temporal_rope=bool(int(seeker_args.get('temporal_rope', 0))),
        rope_time_coords=bool(int(seeker_args.get('rope_time_coords', 0))),
        pretrained=pretrained)
    kw.update(overrides)
    return SeekerConfig(**kw)


def init_params(key: jax.Array, cfg: SeekerConfig) -> Dict[str, Any]:
    D = tsf.DEPTH_PRESETS[cfg.network_depth][0]
    k_bb, k_head, k_flag = jax.random.split(key, 3)
    p_sq = cfg.patch_size * cfg.patch_size
    params = {
        'backbone': tsf.init_params(k_bb, cfg.backbone_config()),
        'post_linear': {
            'w': tsf._trunc_normal(k_head, (D, cfg.output_channels * p_sq)),
            'b': jnp.zeros((cfg.output_channels * p_sq,)),
        },
    }
    if cfg.flag_channels > 0:
        params['flag_linear'] = {
            'w': tsf._trunc_normal(k_flag, (D, cfg.flag_channels)),
            'b': jnp.zeros((cfg.flag_channels,)),
        }
    return params


def _bilinear_align_corners_matrix(n_in: int, n_out: int) -> np.ndarray:
    '''Interpolation matrix M (n_out, n_in) such that y = M @ x reproduces
    torch F.interpolate(mode=bilinear, align_corners=True) along one axis.'''
    M = np.zeros((n_out, n_in), dtype=np.float32)
    if n_out == 1 or n_in == 1:
        M[:, 0] = 1.0
        return M
    src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    i0 = np.clip(np.floor(src).astype(np.int64), 0, n_in - 2)
    frac = (src - i0).astype(np.float32)
    M[np.arange(n_out), i0] = 1.0 - frac
    M[np.arange(n_out), i0 + 1] = frac
    return M


def coarsen_mask(mask: jnp.ndarray, stride: int, mode: str) -> jnp.ndarray:
    '''Avg-pool by `stride` then upsample back, per frame (mask_tracker.py:117-132).
    :param mask (..., H, W).'''
    if stride <= 1:
        return mask
    *lead, H, W = mask.shape
    x = mask.reshape(*lead, H // stride, stride, W // stride, stride)
    x = x.mean(axis=(-3, -1))  # (..., H/s, W/s)
    if mode == 'nearest':
        # torch nearest upsample with integer scale == repeat.
        x = jnp.repeat(jnp.repeat(x, stride, axis=-2), stride, axis=-1)
    elif mode == 'bilinear':
        Mh = jnp.asarray(_bilinear_align_corners_matrix(H // stride, H), mask.dtype)
        Mw = jnp.asarray(_bilinear_align_corners_matrix(W // stride, W), mask.dtype)
        x = jnp.einsum('Hi,...iw->...Hw', Mh, x)
        x = jnp.einsum('Wj,...hj->...hW', Mw, x)
    else:
        raise ValueError(f'unknown track_map_resize: {mode}')
    return x


def forward(params: Dict[str, Any], cfg: SeekerConfig, input_frames: jnp.ndarray,
            query_mask: jnp.ndarray, *, train: bool = False,
            rng: Optional[jax.Array] = None,
            frame_times: Optional[jnp.ndarray] = None
            ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    '''
    :param input_frames (B, 3, T, Hf, Wf).
    :param query_mask (B, 1, T, Hf, Wf).
    :param frame_times optional (B, T) f32 true source timestamps for time-calibrated rope
        (honored only with cfg.temporal_rope; see timesformer.forward).
    :return (output_mask (B, C, T, Hf, Wf) logits, output_flags (B, T, F) or None).
    '''
    B, _, T, Hf, Wf = input_frames.shape
    x = jnp.concatenate([input_frames.astype(jnp.float32),
                         query_mask.astype(jnp.float32)], axis=1)
    feats, _ = tsf.forward(params['backbone'], cfg.backbone_config(), x, None,
                           train=train, rng=rng, frame_times=frame_times)
    # feats: (B, D, T, H', W') -> (B, T, H', W', D)
    feats = feats.transpose(0, 2, 3, 4, 1)
    Ho, Wo = feats.shape[2], feats.shape[3]
    p_sz, C = cfg.patch_size, cfg.output_channels

    hp = params['post_linear']
    patches = jnp.einsum('bthwd,dk->bthwk', feats, hp['w'].astype(feats.dtype)) \
        + hp['b'].astype(feats.dtype)                       # (B,T,H',W', C*p*p)
    # Fold '(C h w)' patch vectors back to pixels (mask_tracker.py:114-115).
    patches = patches.reshape(B, T, Ho, Wo, C, p_sz, p_sz)
    mask = patches.transpose(0, 4, 1, 2, 5, 3, 6).reshape(B, C, T, Ho * p_sz, Wo * p_sz)
    mask = coarsen_mask(mask, cfg.track_map_stride, cfg.track_map_resize)
    mask = mask.astype(jnp.float32)

    flags = None
    if cfg.flag_channels > 0:
        fp = params['flag_linear']
        flags = jnp.einsum('bthwd,df->bthwf', feats, fp['w'].astype(feats.dtype)) \
            + fp['b'].astype(feats.dtype)
        flags = flags.mean(axis=(2, 3)).astype(jnp.float32)  # (B, T, F)

    return mask, flags
