"""Device mesh + sharding rules (GSPMD scale-out).

The reference is strictly single-process single-device (SURVEY §2: no
torch.distributed anywhere).  Scale-out here is pure JAX: a
``Mesh(('data', 'model'))`` over the slice, batch dims sharded over
``data``, wide parameter matrices sharded over ``model``, and XLA inserts
the collectives (psum for gradient/BDR reductions, all-gathers for TP) over
ICI.  Because the train step is a single jitted program with global-view
semantics, every masked batch statistic (BN, MMTM running averages, BDR
group norms) is automatically a *global* reduction — numerically identical
to the single-device run.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, model_parallel: int = 1) -> Mesh:
    """2-D ('data', 'model') mesh.  model_parallel=1 -> pure DP."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def param_pspec(path: str, leaf, min_shard_dim: int = 256) -> P:
    """Sharding rule for a parameter leaf.

    Wide kernels (last dim >= min_shard_dim and divisible by the model-axis
    size at placement time) are tensor-sharded on their output dim over
    ``model``; everything else is replicated.  For ResNet-18 + MMTM this
    puts layer3/layer4 convs, the fc heads, and the MMTM excite matrices on
    the model axis.
    """
    shape = getattr(leaf, "shape", ())
    if len(shape) >= 2 and shape[-1] >= min_shard_dim:
        return P(*([None] * (len(shape) - 1) + ["model"]))
    return P()


def shard_params(params, mesh: Mesh, min_shard_dim: int = 256):
    """Place a parameter pytree on the mesh per ``param_pspec`` (dims not
    divisible by the model-axis size fall back to replication)."""
    from ..utils.pytree import tree_paths

    model_size = mesh.shape["model"]
    flat = dict(tree_paths(params))

    def place(path, leaf):
        spec = param_pspec(path, leaf, min_shard_dim)
        if "model" in spec and leaf.shape[-1] % model_size != 0:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    leaves_placed = {path: place(path, leaf) for path, leaf in flat.items()}
    # rebuild in original structure
    treedef = jax.tree_util.tree_structure(params)
    ordered = [leaves_placed[p] for p, _ in tree_paths(params)]
    return jax.tree_util.tree_unflatten(treedef, ordered)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def shard_batch(batch, mesh: Mesh):
    """Shard every leading (batch) dim over ``data``."""

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, NamedSharding(mesh, P("data")))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, batch)


def shard_train_state(state, mesh: Mesh, min_shard_dim: int = 256):
    """TP-shard params (and the matching optimizer moments), replicate the
    small state (BN stats, MMTM buffers, controller scalars).

    Optimizer moment leaves (momentum traces etc.) mirror parameter shapes,
    so applying the same shape-driven rule places each trace exactly like
    its parameter; hyperparameter scalars fall through to replication."""
    model_size = mesh.shape["model"]
    params = shard_params(state.params, mesh, min_shard_dim)

    def place_like_param(leaf):
        arr = np.asarray(leaf) if not hasattr(leaf, "shape") else leaf
        spec = param_pspec("", arr, min_shard_dim)
        if "model" in spec and arr.shape[-1] % model_size != 0:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    opt_state = state.opt_state
    if opt_state is not None:
        opt_state = jax.tree_util.tree_map(place_like_param, opt_state)

    return state.replace(
        params=params,
        batch_stats=replicate(state.batch_stats, mesh),
        mmtm=replicate(state.mmtm, mesh),
        opt_state=opt_state,
        controller=replicate(state.controller, mesh),
        step=jax.device_put(state.step, NamedSharding(mesh, P())),
        rng=jax.device_put(state.rng, NamedSharding(mesh, P())),
    )
