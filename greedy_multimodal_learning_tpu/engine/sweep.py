"""Fused multi-checkpoint evaluation (BASELINE config 5's "fused eval
sweep").

Evaluating K checkpoints (e.g. best-val and last-epoch, or a whole training
trajectory) sequentially re-runs the data pipeline K times.  TPU-native
alternative: stack the K parameter pytrees along a leading axis and ``vmap``
the forward pass — one compiled program, one pass over the data, K results.
The per-checkpoint compute shares every batch's HBM traffic and the MXU
tiles the stacked matmuls.

Sweep evaluation runs with curation off and discards MMTM state updates
(outputs of a non-curation forward do not depend on the running-average
buffers, models/mmtm.py), so it is a pure map over checkpoints.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.transforms import preprocess
from .metrics import blend_and_per_view_acc, blend_loss


def stack_variable_trees(trees: Sequence[dict]):
    """K structurally-identical pytrees -> one pytree with leading axis K."""
    return jax.tree_util.tree_map(lambda *leaves: jnp.stack([jnp.asarray(l) for l in leaves]), *trees)


def build_sweep_eval_step(model):
    """Returns step(stacked_vars, batch) -> per-checkpoint metric dict
    (vmap infers the checkpoint count from stacked_vars' leading axis)."""

    def one(variables, x, labels, mask):
        (blend, logits, _, _), _ = model.apply(
            variables,
            x,
            jnp.asarray(False),
            jnp.asarray(0, jnp.int32),
            train=False,
            valid_mask=mask,
            mutable=["mmtm"],
        )
        loss = blend_loss(logits, labels, mask)
        blend_acc, per_view = blend_and_per_view_acc(logits, labels, mask)
        return {"loss": loss, "acc": blend_acc, "acc_modal": per_view}

    def step(stacked_vars, batch):
        x = preprocess(batch["images"], train=False, dtype=model.dtype)
        return jax.vmap(lambda v: one(v, x, batch["labels"], batch["mask"]))(stacked_vars)

    return jax.jit(step)


def eval_sweep(model, variable_trees: Sequence[dict], generator, steps=None,
               fold_bn: bool = False) -> List[dict]:
    """Evaluate K checkpoints over one pass of ``generator``.

    ``variable_trees``: list of {'params', 'batch_stats', 'mmtm'} dicts.
    Returns a list of K dicts with size-weighted loss/acc/acc_modal_i.

    ``fold_bn``: sweep forwards always run with running BN stats, so each
    checkpoint's BN affine folds exactly into its conv kernels
    (engine/fold_bn.py) before stacking.  Measured in-context neutral on
    the v5e chip (eval fwd 17.31 vs 17.08 ms at B=256, tools/mfu_probe.py —
    XLA already fuses the eval BN affine into the conv epilogue), so it
    defaults off like the Pallas gating kernel; equivalence pinned by
    tests/test_fold_bn.py for backends where the tradeoff flips.
    """
    K = len(variable_trees)
    if fold_bn:
        from .fold_bn import fold_batchnorm

        folded = []
        for tree in variable_trees:
            t = dict(tree)
            t["params"], t["batch_stats"] = fold_batchnorm(t["params"], t["batch_stats"])
            folded.append(t)
        variable_trees = folded
    stacked = stack_variable_trees(list(variable_trees))
    step = build_sweep_eval_step(model)
    if steps is None:
        steps = len(generator)

    outs, sizes = [], []
    it = iter(generator)
    for _ in range(steps):
        batch = next(it)
        size = batch.pop("size")
        batch.pop("indices", None)
        outs.append(step(stacked, batch))
        sizes.append(size)

    outs = jax.device_get(outs)
    sizes = np.asarray(sizes, np.float64)
    total = max(sizes.sum(), 1.0)
    results = []
    for k in range(K):
        losses = np.array([o["loss"][k] for o in outs])
        accs = np.array([o["acc"][k] for o in outs])
        res = {
            "loss": float((losses * sizes).sum() / total),
            "acc": float((accs * sizes).sum() / total),
        }
        n_modal = outs[0]["acc_modal"].shape[-1]
        for i in range(n_modal):
            vals = np.array([o["acc_modal"][k][i] for o in outs])
            res[f"acc_modal_{i}"] = float((vals * sizes).sum() / total)
        results.append(res)
    return results
