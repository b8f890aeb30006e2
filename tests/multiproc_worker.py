'''
Worker for the REAL multi-host execution tests (tests/test_multiprocess.py): one of N
jax.distributed processes, each with 2 virtual CPU devices, jointly running the jitted
train step over a global data mesh. Prints the resulting loss as `LOSS <value>` so the
parent can compare across processes and against the single-process oracle.

Usage: python multiproc_worker.py <coordinator_port> <process_id> <num_processes> [mode]

Modes:
  (none)   pure data parallelism over all processes' devices.
  tp       + a model=2 tensor-parallel axis (each process's 2 local devices): block
           weights sharded via tp_pspec; also exercises the checkpoint fetch path
           (mesh.fetch_global: collective gather of the non-addressable TP shards) and
           prints a parameter checksum. Works for any nproc (data axis = nproc).
  pp       pipeline parallelism with the PIPE AXIS CROSSING THE PROCESS BOUNDARY: the
           device list is permuted so each (data row, pipe stage) pair spans two
           different processes — the GPipe stage handoffs become real cross-process
           collectives (the DCN path of a pod run), not local transfers.
  ppm      same cross-process pipe topology, but with the MANUAL pipe schedule
           (--pp_manual, timesformer._manual_pipe_scan): the explicit shard_map +
           ppermute stage handoff rides the process boundary — the exact transfer a
           pod's DCN stresses (VERDICT r4 task 5; the GSPMD path is `pp` above).
  driver   runs the REAL train CLI (train.main) with --multihost 1 on a shared synthetic
           dataset: argv[5] = comma-separated extra args ('--k=v,...'), coordinator
           injected by monkeypatching jax.distributed.initialize. Exercises per-step
           stop-flag broadcast, preemption SIGTERM checkpointing, and exact-step resume
           across processes.
'''

import os
import sys


def _cpu_env(n_local: int):
    os.environ['JAX_PLATFORMS'] = 'cpu'
    flags = os.environ.get('XLA_FLAGS', '')
    flags = ' '.join(f for f in flags.split()
                     if 'xla_force_host_platform_device_count' not in f)
    os.environ['XLA_FLAGS'] = (
        flags + f' --xla_force_host_platform_device_count={n_local}').strip()


def driver_main(port, pid, nproc, extra: str):
    '''Run the REAL train CLI under jax.distributed (mode "driver").

    The driver calls jax.distributed.initialize() with no arguments (the production
    coordinator comes from the TPU runtime env); here the test coordinator address is
    injected by wrapping initialize. SIGTERM handling, the per-step stop-flag broadcast,
    checkpointing, and resume then all run through the production code paths.
    '''
    _cpu_env(2)
    import jax
    jax.config.update('jax_platforms', 'cpu')
    orig_init = jax.distributed.initialize

    def init_with_coordinator(*a, **kw):
        return orig_init(coordinator_address=f'localhost:{port}',
                         num_processes=nproc, process_id=pid)

    jax.distributed.initialize = init_with_coordinator
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tcow_tpu.models import timesformer as tsf
    tsf.DEPTH_PRESETS.setdefault(2, (48, 4))
    from tcow_tpu.config import train_args
    from tcow_tpu.train import driver
    from tcow_tpu.utils.logvis import MyLogger
    args = train_args(extra.split('\x1e'))
    state = driver.main(args, MyLogger(args, context='train'))
    import numpy as np
    print(f'FINALSTEP {int(np.asarray(state.step))}', flush=True)
    print('DRIVER_DONE', flush=True)
    jax.distributed.shutdown()


def main():
    port, pid, nproc = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    mode = sys.argv[4] if len(sys.argv) > 4 else ''
    tp = mode == 'tp'
    pp = mode in ('pp', 'ppm')
    ppm = mode == 'ppm'
    if mode == 'driver':
        return driver_main(port, pid, nproc, sys.argv[5])
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
    import numpy as np
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
                          model_axis=mesh_lib.MODEL_AXIS if tp else None,
                          pipe_axis=mesh_lib.PIPE_AXIS if pp else None,
                          pp_stages=2 if pp else 1,
                          pp_microbatches=2 if pp else 0,
                          pp_manual=ppm)
    cfg = step_lib.StepConfig(seeker=seeker, loss=LossConfig(), num_queries=2)
    tx = optim.make_optimizer('adamw', learn_rate=1e-4, num_epochs=10, steps_per_epoch=10)
    state = step_lib.init_train_state(jax.random.key(0), cfg, tx)  # same seed everywhere
    train_step = jax.jit(step_lib.make_train_step(cfg, tx), donate_argnums=(0,))

    # Each process passes only its PROCESS-LOCAL rows (the production multi-host loading
    # path: PrefetchLoader shard_rank/shard_count slices the same-seed global order);
    # shard_batch assembles the global array from the local rows.
    batch_np = synthetic_device_batch(0, B=2 * nproc, Q=2, T=4, H=32, W=48, M=6, K=3)
    if pp:
        # Pipe crosses the process boundary, so each process's addressable devices span
        # EVERY data row (one pipe stage of each): pass the full global batch and let
        # make_array_from_process_local_data slice out the addressable rows.
        local = batch_np
    else:
        local = {k: (v[2 * pid:2 * (pid + 1)] if getattr(v, 'ndim', 0) > 0 else v)
                 for k, v in batch_np.items()}
    # tp mode: (data=nproc, model=2) — the model axis spans each process's 2 local
    # devices, so every TP weight shard is addressable by exactly one data group and the
    # batch rows still shard by process.
    # pp mode: (data=nproc, pipe=2) with the devices PERMUTED so the pipe axis crosses
    # process boundaries: make_mesh reshapes device order as (data, seq, model, pipe)
    # with pipe fastest-varying, so interleaving [p0d0, p1d0, p0d1, p1d1, ...] puts each
    # data row's two pipeline stages on two different processes.
    if pp:
        devs = np.array(jax.devices()).reshape(nproc, 2).T.flatten().tolist()
        mesh = mesh_lib.make_mesh(pipe=2, devices=devs)
        stage_procs = {d.process_index for d in mesh.devices[0, 0, 0, :]}
        assert len(stage_procs) == 2, f'pipe axis does not cross processes: {stage_procs}'
    else:
        mesh = mesh_lib.make_mesh(model=2 if tp else 1)  # all processes' devices
    assert len(mesh.devices.flatten()) == 2 * nproc
    with jax.set_mesh(mesh):
        state = mesh_lib.shard_state(state, mesh, tensor_parallel=tp, pipeline=pp)
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
