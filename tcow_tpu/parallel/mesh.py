'''
Device mesh + sharding rules.

TPU-native replacement for the reference's torch.nn.DataParallel wrap
(/root/reference/train.py:222-223): the batch axis is sharded over a 1-D (or the 'data' axis
of a 2-D) mesh and the jitted train step lets XLA's SPMD partitioner insert the gradient
all-reduce over ICI. A second optional 'seq' axis enables sequence parallelism for the
divided space-time attention (shard patch axis during temporal attention, frame axis during
spatial attention; XLA inserts the all-to-alls at the transposes) — the long-context stretch
config from SURVEY.md section 5.7.
'''

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
SEQ_AXIS = 'seq'


def make_mesh(num_devices: Optional[int] = None, seq: int = 1,
              devices=None) -> Mesh:
    '''1-D data mesh by default; (data, seq) 2-D mesh when seq > 1.'''
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    assert n % seq == 0, (n, seq)
    arr = np.array(devices).reshape(n // seq, seq)
    # Auto axis types: sharding constraints inside the model act as hints (propagated by
    # XLA's SPMD partitioner), not as asserts.
    return Mesh(arr, (DATA_AXIS, SEQ_AXIS),
                axis_types=(jax.sharding.AxisType.Auto,) * 2)


def replicate_tree(tree, mesh: Mesh):
    '''Places every leaf fully replicated across the mesh. Works in both single-process
    and multi-host execution (where device_put to non-addressable devices is illegal;
    every process holds the same values, e.g. the same-seed initialized params).'''
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        def leaf(v):
            if hasattr(v, 'dtype') and jax.dtypes.issubdtype(v.dtype, jax.dtypes.prng_key):
                data = jax.make_array_from_process_local_data(
                    sharding, np.asarray(jax.random.key_data(v)))
                return jax.random.wrap_key_data(data, impl=jax.random.key_impl(v))
            return jax.make_array_from_process_local_data(sharding, np.asarray(v))
        return jax.tree.map(leaf, tree)
    return jax.device_put(tree, sharding)


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
