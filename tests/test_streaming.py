'''
Streaming inference must reproduce the batch causal forward EXACTLY, frame by frame
(causal_attention == 1 makes frame t independent of frames > t).
'''

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import conftest  # noqa: F401
from tcow_tpu.models import mask_tracker as mt
from tcow_tpu.models import streaming


@pytest.fixture(scope='module')
def setup():
    from tcow_tpu.models import timesformer as tsf
    old = dict(tsf.DEPTH_PRESETS)
    tsf.DEPTH_PRESETS[3] = (48, 4)
    cfg = mt.SeekerConfig(num_total_frames=6, frame_height=32, frame_width=48,
                          causal_attention=1, drop_path_rate=0.0, network_depth=3)
    params = mt.init_params(jax.random.key(0), cfg)
    # Non-zero temporal_fc everywhere so temporal mixing is real.
    params['backbone']['blocks']['temporal_fc']['w'] = jax.random.normal(
        jax.random.key(7), params['backbone']['blocks']['temporal_fc']['w'].shape) * 0.05
    yield cfg, params
    tsf.DEPTH_PRESETS.clear()
    tsf.DEPTH_PRESETS.update(old)


def test_streaming_matches_batch_causal(setup):
    cfg, params = setup
    B, T, H, W = 2, 6, 32, 48
    rng = np.random.RandomState(1)
    rgb = jnp.asarray(rng.rand(B, 3, T, H, W), jnp.float32)
    query = jnp.zeros((B, 1, T, H, W)).at[:, :, 1, 8:16, 8:24].set(1.0)

    batch_mask, batch_flags = mt.forward(params, cfg, rgb, query)

    state = streaming.init_stream(params, cfg, batch_size=B, max_frames=T)
    step = jax.jit(lambda s, f, q: streaming.stream_step(params, cfg, s, f, q))
    for t in range(T):
        state, mask_t, flags_t = step(state, rgb[:, :, t], query[:, :, t])
        np.testing.assert_allclose(np.asarray(mask_t), np.asarray(batch_mask[:, :, t]),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(flags_t), np.asarray(batch_flags[:, t]),
                                   rtol=2e-4, atol=2e-5)
    assert int(state.t) == T


def test_streaming_prefix_invariance(setup):
    '''Feeding extra (future) frames must not change earlier outputs — the online guarantee.'''
    cfg, params = setup
    B, T, H, W = 1, 6, 32, 48
    rng = np.random.RandomState(2)
    rgb = jnp.asarray(rng.rand(B, 3, T, H, W), jnp.float32)
    q = jnp.zeros((B, 1, H, W))
    qq = q.at[:, :, 4:10, 4:10].set(1.0)

    def run(frames):
        state = streaming.init_stream(params, cfg, B, max_frames=T)
        outs = []
        for t in range(frames):
            state, m, _ = streaming.stream_step(params, cfg, state, rgb[:, :, t],
                                                qq if t == 0 else q)
            outs.append(np.asarray(m))
        return outs

    out3 = run(3)
    out6 = run(6)
    for t in range(3):
        np.testing.assert_allclose(out3[t], out6[t], rtol=1e-6)
