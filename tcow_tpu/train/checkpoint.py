'''
Self-describing checkpoints with the reference's directory-level layout.

Reference format (/root/reference/train.py:269-304): per-experiment directory containing
  checkpoint.pth      latest state (model + optimizer + LR schedule + epoch + full args)
  model_{e}.pth       periodic snapshots (every checkpoint_every epochs)
  checkpoint_epoch.txt / checkpoint_name.txt   sidecars for cheap epoch lookup
resumed via --resume <name> (args.py:293-298), reconstructed entirely from embedded args at
eval time (eval/inference.py:19-57).

This package keeps the same layout with .npz payloads: every pytree (params, optimizer
state, rng, step) is flattened with jax.tree_util key paths into flat npz keys, and the
args dicts are embedded as JSON. Restoration rebuilds arbitrary optax states by unflattening
into a freshly-constructed template.
'''

import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np


def _is_key_array(leaf) -> bool:
    return hasattr(leaf, 'dtype') and jax.dtypes.issubdtype(leaf.dtype, jax.dtypes.prng_key)


def _flatten_with_paths(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = jax.tree_util.keystr(path)
        if _is_key_array(leaf):
            flat[key] = np.asarray(jax.random.key_data(leaf))
        else:
            flat[key] = np.asarray(leaf)
    return flat


def _unflatten_like(template, flat: Dict[str, np.ndarray]):
    paths_leaves = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths_leaves[0]:
        key = jax.tree_util.keystr(path)
        if key not in flat:
            raise KeyError(f'checkpoint missing leaf {key}')
        val = flat[key]
        if _is_key_array(leaf):
            val = jax.random.wrap_key_data(jnp_asarray_u32(val),
                                           impl=jax.random.key_impl(leaf))
        elif hasattr(leaf, 'dtype') and val.dtype != leaf.dtype:
            val = val.astype(leaf.dtype)
        leaves.append(val)
    return jax.tree_util.tree_unflatten(paths_leaves[1], leaves)


def jnp_asarray_u32(x):
    import jax.numpy as jnp
    return jnp.asarray(x, dtype=jnp.uint32)


def save_checkpoint(checkpoint_dir: str, epoch: int, name: str, params, opt_state=None,
                    rng=None, step=None, train_args: Optional[Dict[str, Any]] = None,
                    dset_args: Optional[Dict[str, Any]] = None,
                    seeker_args: Optional[Dict[str, Any]] = None,
                    checkpoint_every: int = 2, is_debug: bool = False,
                    steps_done: Optional[int] = None) -> str:
    '''Writes checkpoint.npz (+ model_{epoch}.npz snapshot per checkpoint_every) with the
    reference's sidecar files. Returns the main checkpoint path.

    steps_done: mid-epoch (preemption) save — `epoch` is the IN-PROGRESS epoch and
    steps_done train steps of it are complete; resume continues that epoch at that step
    (the batch order is deterministic per (seed, epoch)). No model_{epoch} snapshot is
    written for partial saves.'''
    os.makedirs(checkpoint_dir, exist_ok=True)
    payload = {}
    for prefix, tree in (('params', params), ('opt_state', opt_state),
                         ('rng', rng), ('step', step)):
        if tree is not None:
            for k, v in _flatten_with_paths(tree).items():
                payload[prefix + k] = v
    meta = {
        'epoch': int(epoch),
        'name': name,
        'train_args': train_args or {},
        'dset_args': dset_args or {},
        'seeker_args': seeker_args or {},
        'light': opt_state is None,  # params-only save (--checkpoint_light)
        'partial': steps_done is not None,
        'steps_done_in_epoch': int(steps_done) if steps_done is not None else 0,
        'format_version': 1,
    }
    payload['__meta__'] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)

    main_path = os.path.join(checkpoint_dir, 'checkpoint.npz')
    # Partial (preemption) saves bypass the is_debug thinning: they ARE the resume state.
    if steps_done is not None or not is_debug or epoch % checkpoint_every == 0 \
            or epoch < 0:
        tmp = main_path + '.tmp.npz'
        np.savez(tmp, **payload)
        os.replace(tmp, main_path)
        np.savetxt(os.path.join(checkpoint_dir, 'checkpoint_epoch.txt'),
                   np.array([epoch], dtype=np.int32), fmt='%d')
        with open(os.path.join(checkpoint_dir, 'checkpoint_name.txt'), 'w') as f:
            f.write(name + '\n')
    if steps_done is None and (epoch % checkpoint_every == 0 or epoch < 0):
        snap = os.path.join(checkpoint_dir, f'model_{epoch}.npz')
        if os.path.exists(snap):
            os.remove(snap)
        try:
            os.link(main_path, snap)  # free snapshot (checkpoints are replaced atomically)
        except OSError:
            shutil.copy(main_path, snap)
    return main_path


def load_checkpoint(path: str, state_template=None) -> Dict[str, Any]:
    '''Loads a checkpoint.npz; returns dict with 'epoch', 'train_args', 'dset_args',
    'seeker_args', 'params' (nested dict pytree), and, when `state_template` (a TrainState)
    is given, 'state' restored into it.'''
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    meta = json.loads(bytes(flat.pop('__meta__')).decode())

    def subtree(prefix):
        return {k[len(prefix):]: v for k, v in flat.items() if k.startswith(prefix)}

    out = dict(meta)
    params_flat = subtree('params')
    out['params'] = _nest_from_keystrs(params_flat)
    # Light (params-only) checkpoints carry no optimizer state: restore what is present
    # and keep the template's leaves for the rest (the caller decides whether to warn).
    has_opt = any(k.startswith('opt_state') for k in flat)
    out['opt_restored'] = has_opt
    if state_template is not None:
        restored = []
        for prefix, tree in (('params', state_template.params),
                             ('opt_state', state_template.opt_state),
                             ('rng', state_template.rng), ('step', state_template.step)):
            flat_sub = subtree(prefix)
            if flat_sub:
                restored.append(_unflatten_like(tree, flat_sub))
            else:
                restored.append(tree)
        out['state'] = type(state_template)(*restored)
    return out


def _nest_from_keystrs(flat: Dict[str, np.ndarray]):
    '''Rebuilds a nested dict/list pytree from jax keystr paths like ["a"]["b"][0].'''
    import re
    root: Dict[Any, Any] = {}
    for keystr, val in flat.items():
        parts = re.findall(r"\['([^']+)'\]|\[(\d+)\]", keystr)
        keys = [p[0] if p[0] else int(p[1]) for p in parts]
        node = root
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = val

    def intify(node):
        if isinstance(node, dict):
            if node and all(isinstance(k, int) for k in node):
                return [intify(node[i]) for i in sorted(node)]
            return {k: intify(v) for k, v in node.items()}
        return node

    return intify(root)


def peek_meta(path: str) -> Dict[str, Any]:
    '''Reads ONLY the embedded __meta__ JSON (and whether optimizer state is present)
    from a .npz checkpoint — np.load is lazy, so this costs one small zip member, not
    the full (up to 1.5 GB) payload. Returns the meta dict plus 'opt_restored'.'''
    with np.load(path) as z:
        meta = json.loads(bytes(np.asarray(z['__meta__'])).decode())
        meta['opt_restored'] = any(k.startswith('opt_state') for k in z.files)
    return meta


def find_full_snapshot(checkpoint_path: str) -> Optional[str]:
    '''Newest FULL-state model_{e}.npz snapshot in checkpoint_path's directory (highest
    epoch whose payload carries optimizer state), or None. Used when the latest
    checkpoint.npz is a --checkpoint_light params-only save: resuming training from it
    would silently reinitialize the AdamW moments, so the driver falls back to the last
    full snapshot instead (VERDICT r4 task 3).'''
    import glob
    import re
    d = os.path.dirname(os.path.abspath(checkpoint_path))
    cands = []
    for p in glob.glob(os.path.join(d, 'model_*.npz')):
        m = re.fullmatch(r'model_(-?\d+)\.npz', os.path.basename(p))
        if m:
            cands.append((int(m.group(1)), p))
    for _, p in sorted(cands, reverse=True):
        try:
            if peek_meta(p).get('opt_restored'):
                return p
        except Exception:
            continue
    return None


def resolve_resume_path(checkpoint_root: str, resume: str, epoch: int = -1) -> str:
    '''--resume <name> resolution (args.py:293-298), preferring .npz but accepting the
    reference's .pth files for cross-framework loading.'''
    if os.path.isfile(resume):
        return resume
    base = os.path.join(checkpoint_root, resume)
    if epoch >= 0:
        for ext in ('.npz', '.pth'):
            p = os.path.join(base, f'model_{epoch}{ext}')
            if os.path.exists(p):
                return p
    for ext in ('.npz', '.pth'):
        p = os.path.join(base, f'checkpoint{ext}')
        if os.path.exists(p):
            return p
    raise FileNotFoundError(f'no checkpoint found for resume={resume} under {checkpoint_root}')


def get_checkpoint_epoch(checkpoint_path: str) -> int:
    '''Reads the sidecar epoch file, falling back to the checkpoint payload
    (my_utils.py:14-28); understands both .npz and reference .pth checkpoints.'''
    d = os.path.dirname(checkpoint_path)
    epoch_file = os.path.join(d, 'checkpoint_epoch.txt')
    if os.path.exists(epoch_file):
        return int(np.loadtxt(epoch_file, dtype=np.int32))
    if checkpoint_path.endswith('.pth'):
        import torch
        ckpt = torch.load(checkpoint_path, map_location='cpu', weights_only=False)
        return int(ckpt.get('epoch', -1))
    return int(load_checkpoint(checkpoint_path)['epoch'])
