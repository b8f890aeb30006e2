'''
Fresh-process worker for test_pallas_kernel_path_on_sharded_mesh (tests/test_train_step.py).

Runs ONE (mesh_kw, attention_bwd) case of the sharded fused-Pallas-kernel equivalence
check — full train step with the in-kernel backward under the fused_attention_rows
shard_map wrap (interpret mode) vs the single-device XLA-attention step — in its own
interpreter. Isolation rationale: inside a long-lived pytest process the 8-virtual-device
interpret-mode program can die with a bare SIGABRT in the result fetch (XLA CPU, no CHECK
message), dependent on accumulated in-process state — the identical case passes
deterministically in a fresh process (4/4, measured round 5; NEXT.md OPERATIONAL note).

Usage: python pallas_sharded_worker.py '{"seq": 4}' kernel_x
Prints `PALLAS_SHARDED_OK` on success; any assertion/abort fails the subprocess.
'''

import json
import os
import sys


def main():
    os.environ['JAX_PLATFORMS'] = 'cpu'
    flags = os.environ.get('XLA_FLAGS', '')
    flags = ' '.join(f for f in flags.split()
                     if 'xla_force_host_platform_device_count' not in f)
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()
    mesh_kw = {k: int(v) for k, v in json.loads(sys.argv[1]).items()}
    bwd = sys.argv[2]

    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update('jax_platforms', 'cpu')
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tcow_tpu.data.synthetic import synthetic_device_batch
    from tcow_tpu.models import timesformer as tsf
    from tcow_tpu.models.mask_tracker import SeekerConfig
    from tcow_tpu.objectives.losses import LossConfig
    from tcow_tpu.ops import pallas_attention as pa
    from tcow_tpu.parallel import mesh as mesh_lib
    from tcow_tpu.train import optim, step as step_lib

    tsf.DEPTH_PRESETS.setdefault(2, (32, 4))   # the small_model preset
    seeker = SeekerConfig(num_total_frames=4, frame_height=32, frame_width=32,
                          causal_attention=1, drop_path_rate=0.0, network_depth=2)
    cfg = step_lib.StepConfig(seeker=seeker, loss=LossConfig(), num_queries=2)
    tx = optim.make_optimizer('adamw', learn_rate=1e-3, num_epochs=10, steps_per_epoch=5)
    state = step_lib.init_train_state(jax.random.key(0), cfg, tx)
    batch_np = synthetic_device_batch(11, B=2, Q=2, T=4, H=32, W=32, M=6, K=3)

    train_step = jax.jit(step_lib.make_train_step(cfg, tx))
    state1, aux1 = train_step(state, {k: jnp.asarray(v) for k, v in batch_np.items()},
                              jnp.float32(0.0))

    mesh = mesh_lib.make_mesh(**mesh_kw)
    seeker_k = dataclasses.replace(
        cfg.seeker, batch_axis=mesh_lib.DATA_AXIS,
        seq_axis=mesh_lib.SEQ_AXIS if mesh_kw.get('seq', 1) > 1 else None,
        model_axis=mesh_lib.MODEL_AXIS if mesh_kw.get('model', 1) > 1 else None,
        use_pallas_attention=True, attention_bwd=bwd,
        remat=True, remat_policy='dots_nb_out')
    cfg_k = dataclasses.replace(cfg, seeker=seeker_k)
    step_k = jax.jit(step_lib.make_train_step(cfg_k, tx))
    pa.INTERPRET = True
    with jax.set_mesh(mesh):
        state_s = mesh_lib.shard_state(state, mesh,
                                       tensor_parallel=mesh_kw.get('model', 1) > 1)
        batch_sh = mesh_lib.shard_batch(batch_np, mesh)
        state_k, aux_k = step_k(state_s, batch_sh, jnp.float32(0.0))
        loss_k = float(aux_k['total_seeker'])
        params_k = jax.device_get(state_k.params)
    np.testing.assert_allclose(loss_k, float(aux1['total_seeker']), rtol=5e-4)
    for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(params_k)):
        # Kernel-vs-XLA float noise + cross-shard reduction order.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)
    print('PALLAS_SHARDED_OK', flush=True)


if __name__ == '__main__':
    main()
