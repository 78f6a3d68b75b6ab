from .mesh import make_mesh, param_pspec, replicate, shard_batch, shard_params, shard_train_state
from .multihost import global_batch_from_local, maybe_initialize_distributed
