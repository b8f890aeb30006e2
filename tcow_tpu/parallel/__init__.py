from tcow_tpu.parallel.mesh import make_mesh, shard_batch, replicate_tree, batch_sharding
