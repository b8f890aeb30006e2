from tcow_tpu.parallel.mesh import (make_mesh, shard_batch, replicate_tree,
                                    batch_sharding, shard_state, shard_tree, tp_pspec,
                                    fetch_global, DATA_AXIS, SEQ_AXIS, MODEL_AXIS)
