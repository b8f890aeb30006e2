'''
REAL multi-host execution: two jax.distributed processes (2 virtual CPU devices each)
jointly run the jitted train step over a 4-device global data mesh, exercising the
actual cross-process path (--multihost, driver.py; gRPC coordinator standing in for DCN)
rather than a mocked initialize. The resulting loss must agree across both processes AND
match a single-process 4-device run of the same global batch.
'''

import os
import signal
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

import conftest  # noqa: F401

pytestmark = pytest.mark.slow

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


def _single_process_oracle(B: int = 4) -> float:
    '''Same global batch/config on a 4-device single-process mesh (this pytest process).'''
    import jax
    import jax.numpy as jnp
    from tcow_tpu.data.synthetic import synthetic_device_batch
    from tcow_tpu.models import timesformer as tsf
    from tcow_tpu.models.mask_tracker import SeekerConfig
    from tcow_tpu.objectives.losses import LossConfig
    from tcow_tpu.parallel import mesh as mesh_lib
    from tcow_tpu.train import optim, step as step_lib

    old = dict(tsf.DEPTH_PRESETS)
    tsf.DEPTH_PRESETS.setdefault(2, (48, 4))
    try:
        seeker = SeekerConfig(num_total_frames=4, frame_height=32, frame_width=48,
                              causal_attention=1, drop_path_rate=0.0, network_depth=2,
                              batch_axis=mesh_lib.DATA_AXIS)
        cfg = step_lib.StepConfig(seeker=seeker, loss=LossConfig(), num_queries=2)
        tx = optim.make_optimizer('adamw', learn_rate=1e-4, num_epochs=10,
                                  steps_per_epoch=10)
        state = step_lib.init_train_state(jax.random.key(0), cfg, tx)
        train_step = jax.jit(step_lib.make_train_step(cfg, tx), donate_argnums=(0,))
        batch_np = synthetic_device_batch(0, B=B, Q=2, T=4, H=32, W=48, M=6, K=3)
        mesh = mesh_lib.make_mesh(num_devices=4)
        with jax.set_mesh(mesh):
            state = mesh_lib.replicate_tree(state, mesh)
            batch = mesh_lib.shard_batch(batch_np, mesh)
            state, aux = train_step(state, batch, jnp.float32(0.1))
            return float(aux['total_seeker'])
    finally:
        tsf.DEPTH_PRESETS.clear()
        tsf.DEPTH_PRESETS.update(old)


def _run_workers(mode=(), nproc=2, timeout=420):
    port = _free_port()
    env = dict(os.environ)
    env.pop('TCOW_DRYRUN_CHILD', None)
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(HERE, 'multiproc_worker.py'),
         str(port), str(pid), str(nproc), *mode],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(nproc)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f'worker rc={p.returncode}:\n{out}'
    return outs


def _parse(outs, tag):
    vals = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith(tag + ' ')]
        assert lines, out
        vals.append(float(lines[-1].split()[1]))
    return vals


def test_multihost_driver_preempt_and_exact_step_resume(tmp_path):
    '''The REAL train CLI (train driver, --multihost 1) across 2 jax.distributed
    processes: SIGTERM is delivered to PROCESS 0 ONLY mid-training; the per-step
    stop-flag broadcast must stop BOTH processes at the same step, write one mid-epoch
    checkpoint (process 0 is the writer), and a --resume relaunch must complete the
    schedule with the exact total step count on every process.'''
    from tcow_tpu.data import synthetic
    root = str(tmp_path / 'kub')
    synthetic.write_synthetic_kubric_dataset(root, num_scenes=8, seed=21,
                                             T=8, H=48, W=64, K=4)

    def worker_argv(resume: bool) -> str:
        a = ['--name', 'mhpre', '--data_path', root,
             '--checkpoint_root', str(tmp_path / 'ckpt'),
             '--log_root', str(tmp_path / 'logs'),
             '--batch_size', '4', '--num_queries', '2', '--num_frames', '6',
             '--frame_height', '32', '--frame_width', '48', '--kubric_max_delay', '2',
             '--num_epochs', '3', '--val_every', '99', '--do_val_aug', '0',
             '--do_val_noaug', '0', '--tracker_pretrained', '0',
             '--network_depth', '2', '--num_workers', '1',
             '--compute_dtype', 'float32', '--seed', '3', '--avoid_wandb', '2',
             '--multihost', '1']
        if resume:
            a += ['--resume', 'mhpre']
        return '\x1e'.join(a)

    def launch(resume: bool):
        port = _free_port()
        env = dict(os.environ)
        env.pop('TCOW_DRYRUN_CHILD', None)
        return [subprocess.Popen(
            [sys.executable, os.path.join(HERE, 'multiproc_worker.py'),
             str(port), str(pid), '2', 'driver', worker_argv(resume)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
            for pid in range(2)]

    # Phase 1: launch, wait for the first train epoch to be underway, preempt proc 0.
    procs = launch(resume=False)
    log_fp = os.path.join(str(tmp_path / 'logs'), 'mhpre', 'train.log')
    deadline = time.time() + 420
    started = False
    while time.time() < deadline:
        if any(p.poll() is not None for p in procs):
            break  # a worker died (or finished) early: fall through to the asserts
        if os.path.exists(log_fp):
            with open(log_fp) as f:
                if 'phase: train' in f.read():
                    started = True
                    break
        time.sleep(0.5)
    assert started, 'train epoch never started'
    procs[0].send_signal(signal.SIGTERM)
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f'worker rc={p.returncode}:\n{out}'
    steps = _parse(outs, 'FINALSTEP')
    # The broadcast aligned the exit: both processes left the loop at the SAME step.
    assert steps[0] == steps[1], (steps, outs)
    assert steps[0] < 6, f'run completed before the preemption landed: {steps}'

    from tcow_tpu.train import checkpoint as ckpt_lib
    ckpt_fp = os.path.join(str(tmp_path / 'ckpt'), 'mhpre', 'checkpoint.npz')
    loaded = ckpt_lib.load_checkpoint(ckpt_fp)
    if loaded.get('partial'):
        assert loaded['opt_restored'] is True   # preemption saves are always full

    # Phase 2: resume across both processes; the schedule completes exactly.
    procs = launch(resume=True)
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f'worker rc={p.returncode}:\n{out}'
    steps = _parse(outs, 'FINALSTEP')
    assert steps[0] == steps[1] == 6, (steps, outs)   # 3 epochs x 2 steps (8 scenes, B=4)
    final = ckpt_lib.load_checkpoint(ckpt_fp)
    assert final['partial'] is False and final['epoch'] == 2


def test_two_process_train_step_matches_single_process():
    outs = _run_workers()
    losses = _parse(outs, 'LOSS')
    assert np.isfinite(losses).all(), losses
    # Both processes see the identical (replicated) loss scalar.
    assert abs(losses[0] - losses[1]) < 1e-7, losses

    oracle = _single_process_oracle()
    assert abs(losses[0] - oracle) < 5e-5, (losses, oracle)


def test_four_process_dp_tp_grid():
    '''4 jax.distributed processes on a (data=4, model=2) mesh — 8 global devices, TP
    shards inside each process, DP across all four. Every process must see the identical
    replicated loss, matching the single-process oracle batch-for-batch... the global
    batch here is 8 rows (2 per process), so the oracle uses the same 8-row batch.'''
    outs = _run_workers(mode=('tp',), nproc=4, timeout=600)
    losses = _parse(outs, 'LOSS')
    assert np.isfinite(losses).all(), losses
    assert max(losses) - min(losses) < 1e-7, losses
    digests = _parse(outs, 'PSUM')
    assert max(digests) - min(digests) < 1e-6 * max(abs(digests[0]), 1.0), digests

    oracle = _single_process_oracle(B=8)
    assert abs(losses[0] - oracle) < 5e-5, (losses, oracle)


def test_pipe_axis_crosses_process_boundary():
    '''(data=2, pipe=2) mesh whose PIPE AXIS SPANS THE TWO PROCESSES (permuted device
    list): each data row's two pipeline stages live on different processes, so every
    GPipe stage handoff is a real cross-process transfer — the DCN topology of a pod
    run. The pipelined loss must match the plain-DP single-process oracle.'''
    outs = _run_workers(mode=('pp',), nproc=2, timeout=600)
    losses = _parse(outs, 'LOSS')
    assert np.isfinite(losses).all(), losses
    assert abs(losses[0] - losses[1]) < 1e-7, losses

    oracle = _single_process_oracle(B=4)
    assert abs(losses[0] - oracle) < 5e-5, (losses, oracle)


def test_manual_pipe_crosses_process_boundary():
    '''Same cross-process pipe topology as above, but with the MANUAL schedule
    (--pp_manual, timesformer._manual_pipe_scan): the explicit shard_map + ppermute
    stage handoff crosses a REAL process boundary (gRPC standing in for a pod's DCN),
    not just the single-process virtual mesh of tests/test_manual_pipe.py. The loss
    must match the plain-DP single-process oracle (VERDICT r4 task 5).'''
    outs = _run_workers(mode=('ppm',), nproc=2, timeout=600)
    losses = _parse(outs, 'LOSS')
    assert np.isfinite(losses).all(), losses
    assert abs(losses[0] - losses[1]) < 1e-7, losses

    oracle = _single_process_oracle(B=4)
    assert abs(losses[0] - oracle) < 5e-5, (losses, oracle)


def test_two_process_tensor_parallel_and_checkpoint_gather():
    '''(data=2 processes, model=2 local devices) mesh: TP weights sharded across real
    process boundaries; the train step must match the plain-DP single-process oracle and
    mesh.fetch_global (the checkpoint fetch) must reassemble identical full params on
    every process.'''
    outs = _run_workers(mode=('tp',))
    losses = _parse(outs, 'LOSS')
    assert np.isfinite(losses).all(), losses
    assert abs(losses[0] - losses[1]) < 1e-7, losses
    digests = _parse(outs, 'PSUM')
    assert np.isfinite(digests).all(), digests
    assert abs(digests[0] - digests[1]) < 1e-6 * max(abs(digests[0]), 1.0), digests

    oracle = _single_process_oracle()
    assert abs(losses[0] - oracle) < 5e-5, (losses, oracle)
