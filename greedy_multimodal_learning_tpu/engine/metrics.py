"""Loss and metric definitions.

Mirrors the reference entry-point definitions (reference: train.py:23-40):

* ``blend_loss`` — sum over views of per-view mean cross-entropy,
* ``acc`` — top-1 accuracy of the mean of per-view logits, ×100; the same
  function applied to a single view's logits yields ``acc_modal_i``.

All reductions are mask-weighted: padded rows contribute nothing, and the
"mean" denominator is the *real* batch size, so results are bit-identical
to the reference's variable-size final batch semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_mean(values, mask):
    mask = mask.astype(jnp.float32)
    return jnp.sum(values * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def cross_entropy(logits, labels, mask):
    """Mean CE over valid rows (torch.nn.CrossEntropyLoss semantics)."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return masked_mean(logz - gold, mask)


def blend_loss(per_view_logits, labels, mask):
    """Σ_views CE(view_logits, labels) (reference: train.py:23-29)."""
    return sum(cross_entropy(lg, labels, mask) for lg in per_view_logits)


def acc(logits, labels, mask):
    """Top-1 accuracy ×100 over valid rows (reference: train.py:32-40)."""
    pred = jnp.argmax(logits, axis=-1)
    return masked_mean((pred == labels).astype(jnp.float32), mask) * 100.0


def blend_and_per_view_acc(per_view_logits, labels, mask):
    """(blend_acc, (N,) per-view accs) — the reference's ``metrics`` +
    ``viewwises_metrics`` (reference: src/framework.py:154-156)."""
    blend = sum(lg.astype(jnp.float32) for lg in per_view_logits) / len(per_view_logits)
    blend_acc = acc(blend, labels, mask)
    per_view = jnp.stack([acc(lg, labels, mask) for lg in per_view_logits])
    return blend_acc, per_view
