'''
Worker for the REAL multi-host execution test (tests/test_multiprocess.py): one of N
jax.distributed processes, each with 2 virtual CPU devices, jointly running the jitted
train step over a global data mesh. Prints the resulting loss as `LOSS <value>` so the
parent can compare across processes and against the single-process oracle.

Usage: python multiproc_worker.py <coordinator_port> <process_id> <num_processes> [tp]

With the optional 'tp' mode the mesh gains a model=2 tensor-parallel axis (each process's
2 local devices), block weights are sharded via tp_pspec, and the worker additionally
exercises the checkpoint fetch path (mesh.fetch_global: collective gather of the
non-addressable TP shards) and prints a parameter checksum.
'''

import os
import sys


def main():
    port, pid, nproc = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    tp = len(sys.argv) > 4 and sys.argv[4] == 'tp'
    os.environ['JAX_PLATFORMS'] = 'cpu'
    flags = os.environ.get('XLA_FLAGS', '')
    flags = ' '.join(f for f in flags.split()
                     if 'xla_force_host_platform_device_count' not in f)
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=2').strip()

    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.distributed.initialize(coordinator_address=f'localhost:{port}',
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 2, jax.local_devices()

    import jax.numpy as jnp
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tcow_tpu.data.synthetic import synthetic_device_batch
    from tcow_tpu.models import timesformer as tsf
    from tcow_tpu.models.mask_tracker import SeekerConfig
    from tcow_tpu.objectives.losses import LossConfig
    from tcow_tpu.parallel import mesh as mesh_lib
    from tcow_tpu.train import optim, step as step_lib

    tsf.DEPTH_PRESETS.setdefault(2, (48, 4))
    seeker = SeekerConfig(num_total_frames=4, frame_height=32, frame_width=48,
                          causal_attention=1, drop_path_rate=0.0, network_depth=2,
                          batch_axis=mesh_lib.DATA_AXIS,
                          model_axis=mesh_lib.MODEL_AXIS if tp else None)
    cfg = step_lib.StepConfig(seeker=seeker, loss=LossConfig(), num_queries=2)
    tx = optim.make_optimizer('adamw', learn_rate=1e-4, num_epochs=10, steps_per_epoch=10)
    state = step_lib.init_train_state(jax.random.key(0), cfg, tx)  # same seed everywhere
    train_step = jax.jit(step_lib.make_train_step(cfg, tx), donate_argnums=(0,))

    # Each process passes only its PROCESS-LOCAL rows (the production multi-host loading
    # path: PrefetchLoader shard_rank/shard_count slices the same-seed global order);
    # shard_batch assembles the global array from the local rows.
    batch_np = synthetic_device_batch(0, B=2 * nproc, Q=2, T=4, H=32, W=48, M=6, K=3)
    local = {k: (v[2 * pid:2 * (pid + 1)] if getattr(v, 'ndim', 0) > 0 else v)
             for k, v in batch_np.items()}
    # tp mode: (data=nproc, model=2) — the model axis spans each process's 2 local
    # devices, so every TP weight shard is addressable by exactly one data group and the
    # batch rows still shard by process.
    mesh = mesh_lib.make_mesh(model=2 if tp else 1)  # all processes' devices
    assert len(mesh.devices.flatten()) == 2 * nproc
    with jax.set_mesh(mesh):
        state = mesh_lib.shard_state(state, mesh, tensor_parallel=tp)
        batch = mesh_lib.shard_batch(local, mesh)
        state, aux = train_step(state, batch, jnp.float32(0.1))
        loss = float(aux['total_seeker'])
        if tp:
            w = state.params['backbone']['blocks']['mlp']['fc1']['w']
            assert str(w.sharding.spec) == str(jax.sharding.PartitionSpec(
                None, None, mesh_lib.MODEL_AXIS)), w.sharding.spec
            assert not w.is_fully_addressable  # the gather below is a real collective
            # Checkpoint fetch path: collective gather of TP shards, then a digest every
            # process can print for cross-process comparison.
            host_params = mesh_lib.fetch_global(state.params)
            import numpy as np
            digest = float(np.sum(np.abs(host_params['backbone']['blocks']
                                         ['mlp']['fc1']['w'])))
            print(f'PSUM {digest:.8f}', flush=True)
    print(f'LOSS {loss:.8f}', flush=True)
    jax.distributed.shutdown()


if __name__ == '__main__':
    main()
