'''
Full-seeker numerical parity vs the reference semantics: backbone (vendored torch model) +
decode head (per-patch linear fold, stride-4 avgpool + align-corners bilinear, flag head)
computed with torch ops following mask_tracker.py:107-137.
'''

import numpy as np
import pytest

import conftest
from tcow_tpu.models import mask_tracker as mt
from tcow_tpu.models import torch_import


@pytest.mark.skipif(not conftest.has_reference(), reason='reference unavailable')
def test_full_seeker_parity_vs_torch():
    torch = pytest.importorskip('torch')
    import reference_oracle

    (H, W, T, p) = (32, 48, 6, 16)
    ref = reference_oracle.make_reference_backbone(H, W, p, 4, T, 'divided_space_time', 1,
                                                   network_depth=12)
    D = ref.model.embed_dim
    g = torch.Generator().manual_seed(1)
    post_w = torch.randn(3 * p * p, D, generator=g) * 0.02
    post_b = torch.randn(3 * p * p, generator=g) * 0.01
    flag_w = torch.randn(3, D, generator=g) * 0.02
    flag_b = torch.zeros(3)

    sd = {'tracker_backbone.timesformer.model.' + k: v
          for k, v in ref.model.state_dict().items()}
    sd.update({'tracker_post_linear.weight': post_w, 'tracker_post_linear.bias': post_b,
               'flag_post_linear.weight': flag_w, 'flag_post_linear.bias': flag_b})

    cfg = mt.SeekerConfig(num_total_frames=T, frame_height=H, frame_width=W,
                          causal_attention=1, drop_path_rate=0.0, network_depth=12)
    params = torch_import.seeker_params_from_torch(sd, cfg)

    rng = np.random.RandomState(5)
    rgb = rng.rand(1, 3, T, H, W).astype(np.float32)
    query = np.zeros((1, 1, T, H, W), np.float32)
    query[:, :, 0, 8:16, 16:32] = 1.0

    import jax.numpy as jnp
    mask_jax, flags_jax = mt.forward(params, cfg, jnp.asarray(rgb), jnp.asarray(query))

    # Reference-semantics head on the torch side (mask_tracker.py:107-137).
    with torch.no_grad():
        x = torch.from_numpy(np.concatenate([rgb, query], axis=1))
        feats, _ = reference_oracle.reference_dense_forward(ref, x, 1)   # (B, D, T, H', W')
        feats = feats.permute(0, 2, 3, 4, 1)                              # (B, T, H', W', D)
        patches = torch.nn.functional.linear(feats, post_w, post_b)
        B, Tt, Ho, Wo, _ = patches.shape
        patches = patches.reshape(B, Tt, Ho, Wo, 3, p, p)
        m = patches.permute(0, 4, 1, 2, 5, 3, 6).reshape(B, 3, Tt, Ho * p, Wo * p)
        # 'B C T Hf Wf -> (B T) C Hf Wf' is a permute + reshape (mask_tracker.py:120).
        m2 = m.permute(0, 2, 1, 3, 4).reshape(B * Tt, 3, H, W)
        m2 = torch.nn.functional.avg_pool2d(m2, 4, 4)
        m2 = torch.nn.functional.interpolate(m2, scale_factor=4, mode='bilinear',
                                             align_corners=True)
        mask_ref = m2.reshape(B, Tt, 3, H, W).permute(0, 2, 1, 3, 4)
        flags_ref = torch.nn.functional.linear(feats, flag_w, flag_b).mean(dim=(-2, -3))

    np.testing.assert_allclose(np.asarray(mask_jax), mask_ref.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(flags_jax), flags_ref.numpy(), rtol=1e-4,
                               atol=1e-5)
