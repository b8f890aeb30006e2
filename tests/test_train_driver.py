'''
End-to-end training driver test: synthetic kubric dataset on disk -> config -> driver.main
(2 tiny epochs incl. validation + checkpointing + resume) on the 8-device CPU mesh.
'''

import os
import types

import numpy as np
import pytest

import conftest
from tcow_tpu.data import synthetic


@pytest.fixture(scope='module')
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('kubric_synth')
    synthetic.write_synthetic_kubric_dataset(str(root), num_scenes=4, seed=11,
                                             T=8, H=48, W=64, K=4)
    return str(root)


def make_args(synth_root, tmp_path, name='tdrv1', resume=''):
    from tcow_tpu import config as config_lib
    argv = ['--name', name, '--data_path', synth_root,
            '--checkpoint_root', str(tmp_path / 'checkpoints'),
            '--log_root', str(tmp_path / 'logs'),
            '--batch_size', '2', '--num_queries', '2', '--num_frames', '6',
            '--frame_height', '32', '--frame_width', '48', '--kubric_max_delay', '2',
            '--num_epochs', '2', '--val_every', '1', '--do_val_aug', '1',
            '--tracker_pretrained', '0', '--network_depth', '2', '--num_workers', '2',
            '--compute_dtype', 'float32', '--seed', '3']
    if resume:
        argv += ['--resume', resume]
    return config_lib.train_args(argv)


@pytest.fixture(scope='module')
def tiny_preset():
    from tcow_tpu.models import timesformer as tsf
    old = dict(tsf.DEPTH_PRESETS)
    tsf.DEPTH_PRESETS[2] = (32, 4)
    yield
    tsf.DEPTH_PRESETS.clear()
    tsf.DEPTH_PRESETS.update(old)


class _FakeWandb(types.ModuleType):
    '''Stand-in for the wandb package (absent in this image) to verify the online-logging
    contract (--avoid_wandb 0/1/2, reference args.py:69-70).'''

    def __init__(self):
        super().__init__('wandb')
        self.init_calls = []
        self.logged = []
        self.run = types.SimpleNamespace(summary={})

    def init(self, **kw):
        self.init_calls.append(kw)

    def log(self, payload, step=None):
        self.logged.append(payload)

    def Video(self, fp, fps=None):
        return ('video', fp)


def test_driver_trains_and_resumes(synth_root, tmp_path, tiny_preset, monkeypatch):
    import sys
    from tcow_tpu.train import driver
    from tcow_tpu.utils.logvis import MyLogger

    fake_wandb = _FakeWandb()
    monkeypatch.setitem(sys.modules, 'wandb', fake_wandb)

    args = make_args(synth_root, tmp_path)
    logger = MyLogger(args, context='train')
    state = driver.main(args, logger)
    assert int(np.asarray(state.step)) == 2 * 2  # 4 scenes / batch 2 = 2 steps x 2 epochs

    # Train-time overlay videos (reference train.py:74 -> logvis.py:176-308): interval
    # steps render input/output/target/loss-weight products under logs/<name>/visuals/.
    vis_dir = os.path.join(str(tmp_path / 'logs'), 'tdrv1', 'visuals')
    written = os.listdir(vis_dir)
    for suffix in ('_in', '_out_sn', '_out_oc', '_gt', '_slw'):
        assert any(f'_q0{suffix}.' in f for f in written), (suffix, written)

    # wandb contract at avoid_wandb=0: init called, scalars + media logged online.
    assert fake_wandb.init_calls and fake_wandb.init_calls[0]['project'] == 'tcow'
    assert any('train/loss_total_seeker' in d for d in fake_wandb.logged)
    assert any(any(isinstance(v, tuple) and v[0] == 'video' for v in d.values())
               for d in fake_wandb.logged)

    ckpt_dir = os.path.join(str(tmp_path / 'checkpoints'), 'tdrv1')
    assert os.path.exists(os.path.join(ckpt_dir, 'checkpoint.npz'))
    assert os.path.exists(os.path.join(ckpt_dir, 'checkpoint_epoch.txt'))
    with open(os.path.join(ckpt_dir, 'checkpoint_epoch.txt')) as f:
        assert int(f.read()) == 1

    # Resume into a new run (bootstrap mode, args.py:308-312): starts at epoch 2 == done.
    args2 = make_args(synth_root, tmp_path, name='tdrv1', resume='tdrv1')
    logger2 = MyLogger(args2, context='train')
    state2 = driver.main(args2, logger2)
    assert int(np.asarray(state2.step)) == int(np.asarray(state.step))  # nothing left to do

    # args txt + log file written
    assert os.path.exists(os.path.join(str(tmp_path / 'logs'), 'tdrv1', 'args_train.txt'))


def test_loader_iter_batches_skips_deterministically():
    '''iter_batches(k) yields exactly the batches the full epoch order has at [k:], without
    touching the skipped items (mid-epoch preemption resume).'''
    from tcow_tpu.data.factory import PrefetchLoader

    touched = []

    class _DS:
        def __len__(self):
            return 12

        def __getitem__(self, i):
            touched.append(i)
            return i

    loader = PrefetchLoader(_DS(), batch_size=2, collate_fn=list, shuffle=True,
                            drop_last=True, num_workers=1, seed=5)
    loader.set_epoch(3)
    full = list(loader)
    touched.clear()
    tail = list(loader.iter_batches(2))
    assert tail == full[2:]
    assert sorted(touched) == sorted(sum(full[2:], []))  # skipped items never loaded
    # A different epoch reshuffles.
    loader.set_epoch(4)
    assert list(loader) != full


@pytest.fixture(scope='module')
def synth_root6(tmp_path_factory):
    root = tmp_path_factory.mktemp('kubric_synth6')
    synthetic.write_synthetic_kubric_dataset(str(root), num_scenes=6, seed=13,
                                             T=8, H=48, W=64, K=4)
    return str(root)


def test_preemption_checkpoint_and_midepoch_resume(synth_root6, tmp_path, tiny_preset,
                                                   monkeypatch):
    '''SIGTERM mid-epoch -> the driver finishes the in-flight step, writes a FULL partial
    checkpoint (epoch + steps_done), and exits; --resume continues that epoch at that step
    and completes the schedule with the correct total step count.'''
    import os as _os
    import signal as _signal
    from tcow_tpu.train import driver
    from tcow_tpu.train import checkpoint as ckpt_lib
    from tcow_tpu.utils.logvis import MyLogger

    # _log_step_scalars runs host-side once per completed step (one-step lag: step k is
    # logged while step k+1 is processed), so signaling at the FIRST call lands during
    # step 1 of epoch 0 -> the driver stops with 2 of 3 steps done (6 scenes / batch 2).
    calls = []
    real_log = driver._log_step_scalars

    def log_and_signal(*a, **kw):
        calls.append(1)
        if len(calls) == 1:
            _os.kill(_os.getpid(), _signal.SIGTERM)
        return real_log(*a, **kw)

    monkeypatch.setattr(driver, '_log_step_scalars', log_and_signal)
    prev_handler = _signal.getsignal(_signal.SIGTERM)
    args = make_args(synth_root6, tmp_path, name='tpre1')
    args.avoid_wandb = 2
    state = driver.main(args, MyLogger(args, context='train'))
    assert int(np.asarray(state.step)) == 2
    assert _signal.getsignal(_signal.SIGTERM) is prev_handler  # handler restored

    ckpt_dir = os.path.join(str(tmp_path / 'checkpoints'), 'tpre1')
    loaded = ckpt_lib.load_checkpoint(os.path.join(ckpt_dir, 'checkpoint.npz'))
    assert loaded['partial'] is True
    assert loaded['epoch'] == 0 and loaded['steps_done_in_epoch'] == 2
    assert loaded['opt_restored'] is True   # preemption saves are always full
    assert not os.path.exists(os.path.join(ckpt_dir, 'model_0.npz'))  # no partial snapshot

    monkeypatch.setattr(driver, '_log_step_scalars', real_log)
    args2 = make_args(synth_root6, tmp_path, name='tpre1', resume='tpre1')
    args2.avoid_wandb = 2
    state2 = driver.main(args2, MyLogger(args2, context='train'))
    # Resumed at epoch 0 step 2: 1 remaining step + epoch 1's 3 = 6 total for the 2x3 run.
    assert int(np.asarray(state2.step)) == 6
    final = ckpt_lib.load_checkpoint(os.path.join(ckpt_dir, 'checkpoint.npz'))
    assert final['partial'] is False and final['epoch'] == 1


def test_light_resume_gate_and_full_snapshot_fallback(synth_root, tmp_path, tiny_preset,
                                                      monkeypatch):
    '''Training may not silently reinitialize optimizer state (VERDICT r4 task 3): when
    checkpoint.npz is a --checkpoint_light params-only save, the driver resumes from the
    newest FULL model_{e}.npz beside it; with no full snapshot it refuses unless
    --allow_opt_reinit 1.'''
    import shutil
    from tcow_tpu.train import driver
    from tcow_tpu.train import checkpoint as ckpt_lib
    from tcow_tpu.utils.logvis import MyLogger

    args = make_args(synth_root, tmp_path, name='tlg1')
    args.avoid_wandb = 2
    args.checkpoint_every = 1          # full snapshot model_0/model_1 each epoch
    driver.main(args, MyLogger(args, context='train'))
    ckpt_dir = os.path.join(str(tmp_path / 'checkpoints'), 'tlg1')

    # Make checkpoint.npz LIGHT (params only), as a --checkpoint_light epoch save would.
    full = ckpt_lib.load_checkpoint(os.path.join(ckpt_dir, 'checkpoint.npz'))
    ckpt_lib.save_checkpoint(ckpt_dir, epoch=full['epoch'], name='tlg1',
                             params=full['params'], opt_state=None, rng=None, step=None,
                             checkpoint_every=10**6)
    assert ckpt_lib.peek_meta(os.path.join(ckpt_dir, 'checkpoint.npz'))['light']

    # Fallback: resume runs, loading the newest full snapshot (logged + epoch preserved).
    args2 = make_args(synth_root, tmp_path, name='tlg1', resume='tlg1')
    args2.avoid_wandb = 2
    state2 = driver.main(args2, MyLogger(args2, context='train'))
    assert int(np.asarray(state2.step)) == 4   # schedule already complete after fallback

    # No full snapshot anywhere -> hard refusal (not a warning that scrolls by).
    for f in os.listdir(ckpt_dir):
        if f.startswith('model_'):
            os.remove(os.path.join(ckpt_dir, f))
    args3 = make_args(synth_root, tmp_path, name='tlg1', resume='tlg1')
    args3.avoid_wandb = 2
    with pytest.raises(ValueError, match='allow_opt_reinit'):
        driver.main(args3, MyLogger(args3, context='train'))

    # --allow_opt_reinit 1 accepts the light checkpoint explicitly.
    args4 = make_args(synth_root, tmp_path, name='tlg1', resume='tlg1')
    args4.avoid_wandb = 2
    args4.allow_opt_reinit = True
    state4 = driver.main(args4, MyLogger(args4, context='train'))
    assert int(np.asarray(state4.step)) == 0   # epoch count already done; nothing ran
    shutil.rmtree(ckpt_dir, ignore_errors=True)


def test_multihost_smoke(synth_root, tmp_path, tiny_preset, monkeypatch):
    '''--multihost initializes jax.distributed before building the mesh (driver.py; the
    real coordinator env comes from the TPU runtime) and training proceeds single-process
    when initialize is a no-op. Mocked because no second host exists here (SURVEY.md 5.8).'''
    import jax
    from tcow_tpu.train import driver
    from tcow_tpu.utils.logvis import MyLogger

    calls = []
    monkeypatch.setattr(jax.distributed, 'initialize', lambda *a, **k: calls.append(1))

    args = make_args(synth_root, tmp_path, name='tmh1')
    args.multihost = True
    args.num_epochs = 1
    args.do_val_aug = False
    logger = MyLogger(args, context='train')
    state = driver.main(args, logger)
    assert calls == [1]
    assert int(np.asarray(state.step)) == 2  # 4 scenes / batch 2 = 2 steps x 1 epoch

def test_h2d_prefetcher_order_errors_and_close():
    '''--h2d_prefetch double buffering (driver._H2DPrefetcher): batches come out in loader
    order with their uploads already issued; loader exceptions re-raise in the consumer;
    close() unblocks a producer waiting on a full queue.'''
    import time

    import jax
    from tcow_tpu.parallel import mesh as mesh_lib
    from tcow_tpu.train import driver

    mesh = mesh_lib.make_mesh()

    def batches(n):
        for i in range(n):
            yield {'device': {'x': np.full((8, 2), i, np.float32), 's': np.float32(i)}}

    pf = driver._H2DPrefetcher(batches(5), mesh)
    seen = []
    for host, dev in pf:
        assert isinstance(dev['x'], jax.Array) and dev['x'].shape == (8, 2)
        assert float(dev['s']) == float(host['device']['s'])
        seen.append(int(host['device']['x'][0, 0]))
    pf.close()
    assert seen == [0, 1, 2, 3, 4]

    # Loader exception surfaces in the consumer (after the items before it).
    def broken():
        yield {'device': {'x': np.zeros((8, 2), np.float32)}}
        raise RuntimeError('loader boom')

    pf = driver._H2DPrefetcher(broken(), mesh)
    it = iter(pf)
    next(it)
    with pytest.raises(RuntimeError, match='loader boom'):
        next(it)
    pf.close()

    # Early close() with a producer blocked on the full queue: join must succeed.
    pf = driver._H2DPrefetcher(batches(50), mesh)
    next(iter(pf))
    time.sleep(0.05)   # let the producer refill + block on the bounded queue
    pf.close()
    assert not pf._thread.is_alive()
