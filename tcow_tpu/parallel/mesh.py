'''
Device mesh + sharding rules.

TPU-native replacement for the reference's torch.nn.DataParallel wrap
(/root/reference/train.py:222-223): the batch axis is sharded over a 1-D (or the 'data' axis
of a 2-D/3-D) mesh and the jitted train step lets XLA's SPMD partitioner insert the gradient
all-reduce over ICI. An optional 'seq' axis enables sequence parallelism for the
divided space-time attention (shard patch axis during temporal attention, frame axis during
spatial attention; XLA inserts the all-to-alls at the transposes) — the long-context stretch
config from SURVEY.md section 5.7. An optional 'model' axis enables tensor parallelism
(Megatron-style sharded block weights + head-parallel attention, see `tp_pspec`), for
models whose weights or activations outgrow one chip's HBM.
'''

from typing import Any, Callable, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
SEQ_AXIS = 'seq'
MODEL_AXIS = 'model'
PIPE_AXIS = 'pipe'


def make_mesh(num_devices: Optional[int] = None, seq: int = 1, model: int = 1,
              pipe: int = 1, devices=None) -> Mesh:
    '''(data, seq, model, pipe) mesh; seq/model/pipe default to size-1 axes (pure data
    parallel). 'pipe' carries GPipe-style pipeline stages (timesformer._gpipe_scan).'''
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    assert n % (seq * model * pipe) == 0, (n, seq, model, pipe)
    arr = np.array(devices).reshape(n // (seq * model * pipe), seq, model, pipe)
    # Auto axis types: sharding constraints inside the model act as hints (propagated by
    # XLA's SPMD partitioner), not as asserts.
    return Mesh(arr, (DATA_AXIS, SEQ_AXIS, MODEL_AXIS, PIPE_AXIS),
                axis_types=(jax.sharding.AxisType.Auto,) * 4)


def tp_pspec(path, leaf, model_axis=MODEL_AXIS) -> P:
    '''Tensor-parallel PartitionSpec for one (path, leaf) of the seeker param tree (or of
    any tree embedding it, e.g. AdamW moments — the rule keys on trailing dict-key names,
    which optax state trees preserve).

    Layout (Megatron-style, adapted to the stacked-[L,·,·] block params executed under
    lax.scan and to the reference's fused (3, H, dh) qkv packing, vit.py:78-123):
      - attn/temporal_attn qkv.w [L, D, 3D]: ROW-parallel (contraction dim sharded, psum
        after). A column split would cross the fused q/k/v boundaries — the (3, H, dh)
        output layout is not head-major, so output-dim shards misalign with heads and
        GSPMD would all-gather at the (S, 3, H, dh) reshape. Row-parallel costs one psum
        of the qkv activations but keeps every reshape local.
      - attn/temporal_attn proj.w [L, D, D]: ROW-parallel — its input dim IS head-major
        (D = H*dh merged from the per-head attention outputs), so the head-sharded
        activations feed it without any resharding; psum after.
      - mlp fc1.w [L, D, Hm] + fc1.b: COLUMN-parallel (hidden activations sharded).
      - mlp fc2.w [L, Hm, D]: ROW-parallel (consumes the sharded hidden dim; psum after).
      - everything else (embeddings, norms, temporal_fc, heads, biases of row-parallel
        layers, optimizer scalars): replicated.
    '''
    return block_pspec(path, leaf, model_axis=model_axis)


def block_pspec(path, leaf, model_axis=None, pipe_axis=None) -> P:
    '''General (TP x PP) PartitionSpec for one (path, leaf) of a tree embedding the seeker
    params. Composes the Megatron TP layout above (when model_axis is set) with pipeline
    parallelism (when pipe_axis is set): every stacked-[L, ...] leaf under a 'blocks'
    subtree shards its leading block axis over pipe_axis — contiguous L/S chunks land on
    stage devices, exactly matching timesformer._gpipe_scan's (S, L/S, ...) stage split,
    so the pipeline reshape is relayout-free.'''
    names = tuple(k.key for k in path if isinstance(k, jax.tree_util.DictKey))
    ndim = np.ndim(leaf)
    lead = pipe_axis if (pipe_axis is not None and 'blocks' in names and ndim >= 1) \
        else None
    if model_axis is not None and len(names) >= 3 and ndim == 3:
        gp, parent, leafname = names[-3], names[-2], names[-1]
        if leafname == 'w':
            if parent in ('qkv', 'proj') and gp in ('attn', 'temporal_attn'):
                return P(lead, model_axis, None)
            if parent == 'fc1' and gp == 'mlp':
                return P(lead, None, model_axis)
            if parent == 'fc2' and gp == 'mlp':
                return P(lead, model_axis, None)
    if model_axis is not None and len(names) >= 3 and ndim == 2:
        if names[-1] == 'b' and names[-2] == 'fc1' and names[-3] == 'mlp':
            return P(lead, model_axis)
    if lead is not None:
        return P(*((lead,) + (None,) * (ndim - 1)))
    return P()


def shard_tree(tree, mesh: Mesh, pspec_fn: Optional[Callable[..., P]] = None):
    '''Places a pytree on the mesh. `pspec_fn(path, leaf) -> PartitionSpec` picks each
    leaf's layout (None = fully replicate everything). PRNG-key leaves always replicate.

    Works in both single-process and multi-host execution (where device_put to
    non-addressable devices is illegal; every process holds the same full values, e.g. the
    same-seed initialized params, and jax.make_array_from_callback slices out the local
    shards).'''
    repl = NamedSharding(mesh, P())

    def place(path, v):
        sh = repl if pspec_fn is None else NamedSharding(mesh, pspec_fn(path, v))
        if hasattr(v, 'dtype') and jax.dtypes.issubdtype(v.dtype, jax.dtypes.prng_key):
            data = np.asarray(jax.random.key_data(v))
            if jax.process_count() > 1:
                arr = jax.make_array_from_callback(data.shape, repl, lambda i: data[i])
            else:
                arr = jax.device_put(data, repl)
            return jax.random.wrap_key_data(arr, impl=jax.random.key_impl(v))
        if jax.process_count() > 1:
            vv = np.asarray(v)
            return jax.make_array_from_callback(vv.shape, sh, lambda i: vv[i])
        return jax.device_put(v, sh)

    return jax.tree_util.tree_map_with_path(place, tree)


def replicate_tree(tree, mesh: Mesh):
    '''Places every leaf fully replicated across the mesh.'''
    return shard_tree(tree, mesh)


def shard_state(state, mesh: Mesh, tensor_parallel: bool = False,
                pipeline: bool = False):
    '''Places a TrainState (or params tree): tensor-parallel block weights sharded over
    the model axis and/or pipeline-stage block chunks over the pipe axis (block_pspec —
    AdamW moments follow automatically by path suffix), all else replicated.'''
    if not (tensor_parallel or pipeline):
        return shard_tree(state, mesh)
    ma = MODEL_AXIS if tensor_parallel else None
    pa = PIPE_AXIS if pipeline else None
    return shard_tree(state, mesh,
                      lambda path, leaf: block_pspec(path, leaf, model_axis=ma,
                                                     pipe_axis=pa))


def _relay_probe(logger=None, tag: str = '', max_wait: float = 900.0) -> float:
    '''Round-trips a tiny scalar through the default device and returns the elapsed
    seconds. Runs the transfer in a worker thread so a wedged link (the axon relay is
    known to hang transfers in ep_poll after a big upload or a SIGTERM'd predecessor —
    NEXT.md round-4 OPERATIONAL) surfaces as observable waiting we can log/back off on,
    instead of an indefinite silent futex hang in the main thread. Raises RuntimeError
    if the probe does not complete within max_wait.'''
    import threading
    import time

    box: Dict[str, Any] = {}

    def run():
        try:
            x = jax.device_put(np.ones((), np.float32))
            box['v'] = float(np.asarray(x))
        except Exception as e:   # surfaced by the caller
            box['err'] = e
    t0 = time.time()
    th = threading.Thread(target=run, daemon=True)
    th.start()
    waited = 0.0
    while th.is_alive() and waited < max_wait:
        th.join(15.0)
        waited = time.time() - t0
        if th.is_alive() and logger is not None and waited >= 30.0:
            logger.warning(f'device link probe{tag} still pending after {waited:.0f}s '
                           f'(relay congested) — waiting up to {max_wait:.0f}s')
    if th.is_alive():
        raise RuntimeError(f'device link wedged: probe{tag} did not complete in '
                           f'{max_wait:.0f}s')
    if 'err' in box:
        raise box['err']
    return time.time() - t0


def shard_state_staged(state, mesh: Mesh, tensor_parallel: bool = False,
                       pipeline: bool = False, slab_bytes: int = 192 << 20,
                       logger=None):
    '''shard_state for HOST-resident (checkpoint-loaded) trees over a fragile link:
    uploads leaves in bounded slabs (default 192 MB) with a scalar round-trip probe
    between slabs so the transfer stream is paced and drained instead of flooded.

    Motivation (VERDICT r4 task 3): the single-shot 1.47 GB full-state upload after
    load_checkpoint reliably wedged the axon relay (3 of 4 resumes, NEXT.md round-4
    OPERATIONAL) while the 489 MB params-only uploads always succeeded — bounded slabs
    keep every burst in the proven regime. An initial probe additionally gates the whole
    upload on link health (eager ops recover first after a wedge), and a slow probe
    (>5 s) triggers a backoff sleep so the relay drains before the next slab. Leaves
    already on device (jax.Array) pass through without pacing, so the non-resume path
    costs one probe. On real PCIe/DMA hardware the probes are microseconds.

    Multi-host delegates to shard_state: placement there uses
    jax.make_array_from_callback (no relay, real ICI/PCIe).'''
    import time

    if jax.process_count() > 1:
        return shard_state(state, mesh, tensor_parallel, pipeline)
    pspec_fn = None
    if tensor_parallel or pipeline:
        ma = MODEL_AXIS if tensor_parallel else None
        pa = PIPE_AXIS if pipeline else None
        pspec_fn = lambda path, leaf: block_pspec(path, leaf, model_axis=ma,  # noqa: E731
                                                  pipe_axis=pa)
    repl = NamedSharding(mesh, P())
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(state)

    def pace(tag):
        dt = _relay_probe(logger, tag=tag)
        if dt > 5.0:
            nap = min(60.0, 4.0 * dt)
            if logger is not None:
                logger.warning(f'device link slow ({dt:.1f}s probe{tag}); '
                               f'backing off {nap:.0f}s before the next slab')
            time.sleep(nap)

    pace(' [pre-upload]')
    out, pending, slab = [], 0, 0
    for path, v in paths_leaves:
        sh = repl if pspec_fn is None else NamedSharding(mesh, pspec_fn(path, v))
        if hasattr(v, 'dtype') and jax.dtypes.issubdtype(v.dtype, jax.dtypes.prng_key):
            data = np.asarray(jax.random.key_data(v))
            arr = jax.random.wrap_key_data(jax.device_put(data, repl),
                                           impl=jax.random.key_impl(v))
            from_host, nbytes = True, data.nbytes
        else:
            from_host = not isinstance(v, jax.Array)
            arr = jax.device_put(v, sh)
            nbytes = int(getattr(v, 'nbytes', 0) or 0)
        out.append(arr)
        if from_host:
            pending += nbytes
            if pending >= slab_bytes:
                slab += 1
                pace(f' [slab {slab}, {pending / 2**20:.0f} MB]')
                pending = 0
    if pending:
        pace(f' [final slab, {pending / 2**20:.0f} MB]')
    return jax.tree_util.tree_unflatten(treedef, out)


def fetch_global(tree):
    '''device_get that also works for tensor-parallel (model-axis sharded) leaves under
    multi-host execution: a non-addressable, non-replicated leaf is first gathered with a
    collective — so EVERY process must call this, in the same order (checkpointing callers
    gate the subsequent WRITE on process 0, not the fetch).'''
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        def leaf(l):
            sh = getattr(l, 'sharding', None)
            if sh is not None and not l.is_fully_addressable \
                    and not sh.is_fully_replicated:
                return multihost_utils.process_allgather(l, tiled=True)
            return l
        tree = jax.tree.map(leaf, tree)  # deterministic order -> aligned collectives
    return jax.device_get(tree)


def batch_sharding(mesh: Mesh, leaf) -> NamedSharding:
    '''Batch-leading arrays shard on the data axis; scalars replicate.'''
    if np.ndim(leaf) == 0:
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(batch: Dict[str, Any], mesh: Mesh):
    '''Device-puts a host batch with the batch axis sharded over the data axis.

    Multi-host: jax.make_array_from_process_local_data assembles the global array without
    cross-host transfers. Each process may pass EITHER the full global batch (identical on
    every process, e.g. same-seed loaders — the API slices out this process's addressable
    rows) or just its process-local rows (local leading dim = B_global / process_count,
    in mesh/process order). Scalars must be identical on every process.'''
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(batch_sharding(mesh, v),
                                                          np.asarray(v))
                for k, v in batch.items()}
    return {k: jax.device_put(v, batch_sharding(mesh, v)) for k, v in batch.items()}


def batch_pspec(batch: Dict[str, Any]) -> Dict[str, P]:
    return {k: (P() if np.ndim(v) == 0 else P(DATA_AXIS)) for k, v in batch.items()}
