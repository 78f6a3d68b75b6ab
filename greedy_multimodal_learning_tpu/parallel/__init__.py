from .mesh import make_mesh, param_pspec, replicate, shard_batch, shard_params, shard_train_state
