'''
Seeker facade: a thin convenience wrapper bundling a SeekerConfig with its parameters,
mirroring the trivial `Seeker` wrapper in the reference (/root/reference/model/seeker.py:17-25).

The functional API (mask_tracker.init_params / mask_tracker.forward) is what training and
evaluation code use; this class exists for interactive use and API familiarity.
'''

from typing import Any, Dict, Optional

import jax

from tcow_tpu.models import mask_tracker
from tcow_tpu.models.mask_tracker import SeekerConfig, seeker_config_from_args


class Seeker:

    def __init__(self, cfg: SeekerConfig, params: Optional[Dict[str, Any]] = None,
                 rng: Optional[jax.Array] = None):
        self.cfg = cfg
        if params is None:
            params = mask_tracker.init_params(rng if rng is not None else jax.random.key(0), cfg)
        self.params = params

    @classmethod
    def from_seeker_args(cls, seeker_args: Dict[str, Any], rng=None, **overrides) -> 'Seeker':
        return cls(seeker_config_from_args(seeker_args, **overrides), rng=rng)

    @classmethod
    def from_checkpoint(cls, path: str) -> 'Seeker':
        from tcow_tpu.models import torch_import
        if path.endswith('.pth'):
            params, cfg, _ = torch_import.load_tcow_checkpoint(path)
            return cls(cfg, params)
        from tcow_tpu.train import checkpoint as ckpt_lib
        state = ckpt_lib.load_checkpoint(path)
        cfg = seeker_config_from_args(state['seeker_args'])
        return cls(cfg, state['params'])

    def __call__(self, input_frames, query_mask, *, train: bool = False, rng=None,
                 frame_times=None):
        '''(B,3,T,H,W), (B,1,T,H,W) -> (mask_logits (B,3,T,H,W), flags (B,T,F)).'''
        return mask_tracker.forward(self.params, self.cfg, input_frames, query_mask,
                                    train=train, rng=rng, frame_times=frame_times)
