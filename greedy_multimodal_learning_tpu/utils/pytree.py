"""Pytree helpers (the JAX-native analogue of the reference's recursive
tensor-structure utilities, reference: src/utils.py:85-128)."""

from __future__ import annotations

import jax
import numpy as np


def tree_to_numpy(tree):
    """Device pytree -> host numpy pytree (torch_to_numpy analogue,
    reference: src/utils.py:121-126).

    All device->host copies are started asynchronously before the first
    blocking conversion: on a remote/tunneled TPU backend every *serial*
    fetch pays the full link round-trip (~1 s measured on this dev tunnel,
    ~230 leaves = minutes per checkpoint), whereas overlapped copies cost
    one round-trip total."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if isinstance(leaf, jax.Array) and hasattr(leaf, "copy_to_host_async"):
            leaf.copy_to_host_async()
    return jax.tree_util.tree_map(lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree)


def tree_size_bytes(tree) -> int:
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(x.size * x.dtype.itemsize for x in leaves if hasattr(x, "size"))


def tree_paths(tree):
    """Flatten a pytree into (path_string, leaf) pairs.

    Path strings are '/'-joined key names, used for the BDR parameter-group
    partitioning that mirrors the reference's named_parameters() substring
    matching (reference: src/callbacks.py:203-223).
    """
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for path, leaf in flat:
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "name"):
                parts.append(str(p.name))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
            else:
                parts.append(str(p))
        out.append(("/".join(parts), leaf))
    return out
