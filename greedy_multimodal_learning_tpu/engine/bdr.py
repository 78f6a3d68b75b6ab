"""In-step BDR (bypass-to-main learning-speed ratio) statistics.

The reference measures per-modality conditional learning speed by walking
every named parameter on the *host* after each backward pass, computing
Σ‖g‖²/Σ‖w‖² for each of four groups — per-modality main branches and
per-modality MMTM bypass — with ~120 device syncs per step
(reference: src/callbacks.py:199-233).

TPU-native re-architecture (SURVEY §7.5): group membership is resolved
*once* from parameter pytree paths using the same substring rules
(reference: src/callbacks.py:203-223):

* a path containing ``mmtm`` is a bypass parameter; within bypass, a path
  containing modality name i (MMTMnames) belongs to modality i's bypass
  group, otherwise it is shared and counts toward *every* modality's bypass,
* otherwise a path containing branch name i (branchnames, e.g.
  ``net_view_0``) belongs to modality i's main group.

Inside the jitted step the per-group Σ‖·‖² reductions are two masked
tree-reductions (a (L,) vector of per-leaf sums contracted with a (L, 2N)
0/1 matrix) — no host involvement; only 4N scalars leave the step.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.pytree import tree_paths


def build_group_matrix(
    params,
    branchnames: Sequence[str] = ("net_view_0", "net_view_1"),
    mmtm_names: Sequence[str] = ("visual", "skeleton"),
) -> np.ndarray:
    """(L, 2N) 0/1 matrix; columns = [main_0..main_{N-1}, bypass_0..bypass_{N-1}],
    rows follow ``jax.tree_util.tree_leaves(params)`` order."""
    n = len(branchnames)
    assert len(mmtm_names) == n
    paths = tree_paths(params)
    mat = np.zeros((len(paths), 2 * n), np.float32)
    for row, (path, _) in enumerate(paths):
        if "mmtm" in path:
            shared = True
            for i, modal in enumerate(mmtm_names):
                if modal in path:
                    mat[row, n + i] = 1.0
                    shared = False
            if shared:
                mat[row, n:] = 1.0
        else:
            for i, branch in enumerate(branchnames):
                if branch in path:
                    mat[row, i] = 1.0
    return mat


def group_sq_norms(tree, group_matrix: jnp.ndarray) -> jnp.ndarray:
    """Per-group Σ‖leaf‖² — jit-friendly masked tree reduction.

    Returns (2N,) float32: [main_0.., bypass_0..].
    (Reference implementation; the fast path is :class:`GroupReducer`.)
    """
    leaf_sums = jnp.stack(
        [jnp.sum(jnp.square(leaf.astype(jnp.float32))) for leaf in jax.tree_util.tree_leaves(tree)]
    )
    return leaf_sums @ group_matrix


class GroupReducer:
    """Fast in-step group reduction.

    Per-leaf reductions launch one tiny kernel per parameter (~240 kernels
    per step measured on v5e).  Leaves sharing the same group-membership
    *pattern* (main_0 / main_1 / bypass_0 / bypass_1 / shared-bypass /
    ungrouped — at most 2^(2N) but ≤6 in practice) are instead flattened,
    concatenated, and reduced in ONE kernel per pattern; the per-pattern
    sums then scatter into the (2N,) result by the pattern vectors.
    (A segment_sum formulation was tried first and is ~400 ms on TPU — it
    lowers to scatter-add; avoid.)
    """

    def __init__(
        self,
        params,
        branchnames: Sequence[str] = ("net_view_0", "net_view_1"),
        mmtm_names: Sequence[str] = ("visual", "skeleton"),
    ):
        self.matrix = build_group_matrix(params, branchnames, mmtm_names)
        patterns = {}
        for row, vec in enumerate(self.matrix):
            patterns.setdefault(tuple(vec.tolist()), []).append(row)
        # drop all-zero pattern (ungrouped leaves contribute nothing)
        self.patterns = [
            (np.asarray(vec, np.float32), rows)
            for vec, rows in patterns.items()
            if any(vec)
        ]

    def __call__(self, tree) -> jnp.ndarray:
        leaves = jax.tree_util.tree_leaves(tree)
        total = jnp.zeros((self.matrix.shape[1],), jnp.float32)
        for vec, rows in self.patterns:
            flat = jnp.concatenate([leaves[r].reshape(-1).astype(jnp.float32) for r in rows])
            total = total + jnp.asarray(vec) * jnp.sum(flat * flat)
        return total
