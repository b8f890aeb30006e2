'''
Backbone tests: shapes, temporal-causality gradient probe, and golden numerical parity
against the reference PyTorch model (when /root/reference is available).

The causality probe is the one documented in the reference at vit.py:115-121:
with causal attention, d out[t] / d in[t'] must be exactly zero for t' > t.
'''

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import conftest
from tcow_tpu.models import timesformer as tsf
from tcow_tpu.models import mask_tracker as mt


def tiny_cfg(**kw):
    base = dict(frame_height=48, frame_width=64, patch_size=16, in_channels=4, num_frames=4,
                depth=2, embed_dim=32, num_heads=4, drop_path_rate=0.0)
    base.update(kw)
    return tsf.TimeSformerConfig(**base)


def test_backbone_shapes_divided():
    cfg = tiny_cfg(causal_attention=1)
    params = tsf.init_params(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 4, 4, 48, 64))
    feats, cls = jax.jit(lambda p, x: tsf.forward(p, cfg, x))(params, x)
    assert feats.shape == (2, 32, 4, 3, 4)
    assert cls.shape == (2, 32)
    assert np.isfinite(np.asarray(feats)).all()


def test_backbone_shapes_joint():
    cfg = tiny_cfg(attention_type='joint_space_time', causal_attention=0)
    params = tsf.init_params(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 4, 4, 48, 64))
    feats, cls = tsf.forward(params, cfg, x)
    assert feats.shape == (2, 32, 4, 3, 4)
    assert cls.shape == (2, 32)


@pytest.mark.parametrize('ca', [1, 2, 3])
def test_temporal_causality(ca):
    '''d out[:, :, t] / d in[:, :, t'] == 0 for all t' > t when causal (vit.py:115-121).
    Note ca in {0, -1} must NOT be causal (the mask applies only for ca > 0, vit.py:93);
    ca>=3 allows (ca-2) frames of lookahead *per block* (tril diagonal=ca-2 in every
    temporal attention, vit.py:95-98).'''
    cfg = tiny_cfg(causal_attention=ca, num_frames=6, frame_height=32, frame_width=32)
    params = tsf.init_params(jax.random.key(0), cfg)
    # Give temporal_fc of later blocks nonzero weights so temporal mixing actually happens.
    params['blocks']['temporal_fc']['w'] = jax.random.normal(
        jax.random.key(7), params['blocks']['temporal_fc']['w'].shape) * 0.1
    x = jax.random.normal(jax.random.key(1), (1, 4, 6, 32, 32))
    t_probe = 1

    def probe(xin):
        feats, _ = tsf.forward(params, cfg, xin)
        return jnp.sum(feats[:, :, t_probe])

    grad = np.asarray(jax.grad(probe)(x))  # (1, 4, T, H, W)
    per_frame = np.abs(grad).sum(axis=(0, 1, 3, 4))
    lookahead = (ca - 2) * cfg.depth if ca >= 3 else 0
    allowed_last = t_probe + lookahead
    assert per_frame[: allowed_last + 1].sum() > 0.0, 'no gradient at/behind the probe frame'
    assert np.all(per_frame[allowed_last + 1:] == 0.0), \
        f'non-causal leakage: {per_frame}'


@pytest.mark.parametrize('ca', [0, -1])
def test_non_causal_has_future_gradients(ca):
    cfg = tiny_cfg(causal_attention=ca)
    params = tsf.init_params(jax.random.key(0), cfg)
    params['blocks']['temporal_fc']['w'] = jax.random.normal(
        jax.random.key(7), params['blocks']['temporal_fc']['w'].shape) * 0.1
    x = jax.random.normal(jax.random.key(1), (1, 4, 4, 48, 64))

    def probe(xin):
        feats, _ = tsf.forward(params, cfg, xin)
        return jnp.sum(feats[:, :, 1])

    grad = np.asarray(jax.grad(probe)(x))
    per_frame = np.abs(grad).sum(axis=(0, 1, 3, 4))
    assert np.all(per_frame > 0.0), 'non-causal attention should see every frame'


def test_seeker_shapes_and_coarsening():
    cfg = mt.SeekerConfig(num_total_frames=4, frame_height=48, frame_width=64,
                          causal_attention=1, drop_path_rate=0.0)
    params = mt.init_params(jax.random.key(0), cfg)
    rgb = jax.random.uniform(jax.random.key(1), (2, 3, 4, 48, 64))
    query = jnp.zeros((2, 1, 4, 48, 64)).at[:, :, 0, 8:16, 8:16].set(1.0)
    mask, flags = mt.forward(params, cfg, rgb, query)
    assert mask.shape == (2, 3, 4, 48, 64)
    assert flags.shape == (2, 4, 3)
    # stride-4 avg pool + bilinear up means the output is smooth: blockwise means survive.
    assert np.isfinite(np.asarray(mask)).all()


def test_coarsen_mask_nearest_blocks():
    x = jnp.arange(16.0).reshape(1, 4, 4)
    y = mt.coarsen_mask(x, 2, 'nearest')
    # 2x2 block means repeated back up.
    expect_00 = float(x[0, :2, :2].mean())
    assert np.allclose(np.asarray(y[0, :2, :2]), expect_00)


def test_bilinear_align_corners_matches_torch():
    torch = pytest.importorskip('torch')
    x = np.random.RandomState(0).rand(2, 3, 6, 8).astype(np.float32)
    got = np.asarray(mt.coarsen_mask(jnp.asarray(x), 2, 'bilinear'))
    with torch.no_grad():
        t = torch.from_numpy(x)
        pooled = torch.nn.functional.avg_pool2d(t, 2, 2)
        up = torch.nn.functional.interpolate(pooled, scale_factor=2, mode='bilinear',
                                             align_corners=True)
    assert np.allclose(got, up.numpy(), atol=1e-6)


@pytest.mark.parametrize('ca,attention_type', [
    (0, 'divided_space_time'),
    (1, 'divided_space_time'),
    (3, 'divided_space_time'),
    (0, 'joint_space_time'),
])
def test_golden_parity_vs_reference(ca, attention_type):
    '''Bit-level (1e-5) parity of the dense backbone vs the vendored PyTorch TimeSformer with
    identical weights on random input.'''
    if not conftest.has_reference():
        pytest.skip('reference checkout unavailable')
    torch = pytest.importorskip('torch')
    import reference_oracle
    from tcow_tpu.models import torch_import

    (H, W, T, C, p) = (48, 64, 4, 4, 16)
    ref = reference_oracle.make_reference_backbone(
        H, W, p, C, T, attention_type, ca, network_depth=12)
    sd = ref.model.state_dict()

    cfg = tsf.config_from_network_depth(
        12, frame_height=H, frame_width=W, patch_size=p, in_channels=C, num_frames=T,
        attention_type=attention_type, causal_attention=ca, drop_path_rate=0.0)
    params = torch_import.backbone_params_from_torch(sd, cfg)

    rng = np.random.RandomState(42)
    x = rng.randn(2, C, T, H, W).astype(np.float32)

    feats_ref, cls_ref = reference_oracle.reference_dense_forward(
        ref, torch.from_numpy(x), ca)
    feats_jax, cls_jax = tsf.forward(params, cfg, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(feats_jax), feats_ref.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cls_jax), cls_ref.numpy(), rtol=1e-4, atol=1e-5)


def test_param_count_matches_reference_scale():
    '''The full-size backbone+head should land at ~121M params (train.py:215-216).'''
    cfg = mt.SeekerConfig()  # defaults: ViT-B/16, 240x320, T=30, 4-ch input
    params = mt.init_params(jax.random.key(0), cfg)
    n = tsf.param_count(params)
    assert 119e6 < n < 123e6, n


def test_multi_resolution_eval_nonsquare_grid():
    '''Eval at a different resolution than training must work even though the training
    patch grid is non-square (the reference crashes here, vision_tf.py:107).'''
    cfg = tiny_cfg(causal_attention=1, frame_height=32, frame_width=64)  # grid 2x4
    params = tsf.init_params(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (1, 4, 4, 64, 96))  # grid 4x6 at eval
    feats, cls = tsf.forward(params, cfg, x)
    assert feats.shape == (1, 32, 4, 4, 6)
    assert np.isfinite(np.asarray(feats)).all()


def test_remat_group_gradient_equivalence():
    '''remat_group batches G blocks per checkpoint region; gradients must be identical to
    the per-block default (G=1) since grouping only changes what is saved vs recomputed.'''
    import dataclasses
    cfg1 = tsf.TimeSformerConfig(frame_height=32, frame_width=48, num_frames=4, depth=4,
                                 embed_dim=64, num_heads=4, causal_attention=1,
                                 drop_path_rate=0.0, remat=True, remat_policy='dots_nb')
    params = tsf.init_params(jax.random.key(0), cfg1)
    x = jax.random.normal(jax.random.key(1), (2, 4, 4, 32, 48))

    def loss(p, cfg):
        feats, _ = tsf.forward(p, cfg, x, train=False)
        return (feats.astype(jnp.float32) ** 2).mean()

    g1 = jax.jit(jax.grad(loss), static_argnums=1)(params, cfg1)
    for G in (2, 4):
        gG = jax.jit(jax.grad(loss), static_argnums=1)(
            params, dataclasses.replace(cfg1, remat_group=G))
        err = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), g1, gG)))
        assert err < 1e-6, (G, err)
