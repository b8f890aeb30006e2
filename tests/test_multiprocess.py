'''
REAL multi-host execution: two jax.distributed processes (2 virtual CPU devices each)
jointly run the jitted train step over a 4-device global data mesh, exercising the
actual cross-process path (--multihost, driver.py; gRPC coordinator standing in for DCN)
rather than a mocked initialize. The resulting loss must agree across both processes AND
match a single-process 4-device run of the same global batch.
'''

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import conftest  # noqa: F401

pytestmark = pytest.mark.slow

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


def _single_process_oracle() -> float:
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
        batch_np = synthetic_device_batch(0, B=4, Q=2, T=4, H=32, W=48, M=6, K=3)
        mesh = mesh_lib.make_mesh(num_devices=4)
        with jax.set_mesh(mesh):
            state = mesh_lib.replicate_tree(state, mesh)
            batch = mesh_lib.shard_batch(batch_np, mesh)
            state, aux = train_step(state, batch, jnp.float32(0.1))
            return float(aux['total_seeker'])
    finally:
        tsf.DEPTH_PRESETS.clear()
        tsf.DEPTH_PRESETS.update(old)


def _run_workers(mode=()):
    port = _free_port()
    nproc = 2
    env = dict(os.environ)
    env.pop('TCOW_DRYRUN_CHILD', None)
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(HERE, 'multiproc_worker.py'),
         str(port), str(pid), str(nproc), *mode],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(nproc)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
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


def test_two_process_train_step_matches_single_process():
    outs = _run_workers()
    losses = _parse(outs, 'LOSS')
    assert np.isfinite(losses).all(), losses
    # Both processes see the identical (replicated) loss scalar.
    assert abs(losses[0] - losses[1]) < 1e-7, losses

    oracle = _single_process_oracle()
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
