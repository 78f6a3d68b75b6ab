"""Loss/metric semantics: masked padded-batch results equal unpadded
smaller-batch results, and match torch CE."""

import numpy as np
import pytest

import jax.numpy as jnp

from greedy_multimodal_learning_tpu.engine.metrics import acc, blend_loss, cross_entropy


def test_masked_equals_smaller_batch():
    rng = np.random.default_rng(0)
    logits = [rng.normal(size=(5, 7)).astype(np.float32) for _ in range(2)]
    labels = rng.integers(0, 7, (5,)).astype(np.int32)
    # pad to 8
    plogits = [np.concatenate([lg, np.zeros((3, 7), np.float32)]) for lg in logits]
    plabels = np.concatenate([labels, np.zeros((3,), np.int32)])
    mask = np.array([1, 1, 1, 1, 1, 0, 0, 0], np.float32)

    small = blend_loss([jnp.asarray(l) for l in logits], jnp.asarray(labels), jnp.ones((5,)))
    padded = blend_loss([jnp.asarray(l) for l in plogits], jnp.asarray(plabels), jnp.asarray(mask))
    np.testing.assert_allclose(float(small), float(padded), rtol=1e-6)

    a_small = acc(jnp.asarray(logits[0]), jnp.asarray(labels), jnp.ones((5,)))
    a_pad = acc(jnp.asarray(plogits[0]), jnp.asarray(plabels), jnp.asarray(mask))
    np.testing.assert_allclose(float(a_small), float(a_pad), rtol=1e-6)


def test_cross_entropy_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(6, 9)).astype(np.float32)
    labels = rng.integers(0, 9, (6,)).astype(np.int64)
    ours = cross_entropy(jnp.asarray(logits), jnp.asarray(labels.astype(np.int32)), jnp.ones((6,)))
    theirs = torch.nn.CrossEntropyLoss()(torch.from_numpy(logits), torch.from_numpy(labels))
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-6)


def test_acc_is_percent_of_mean_logits():
    """acc mirrors the reference metric: argmax of the mean of per-view
    logits, x100 (reference: train.py:32-40)."""
    logits = [np.array([[10.0, 0.0], [0.0, 10.0]], np.float32), np.array([[0.0, 1.0], [0.0, 1.0]], np.float32)]
    labels = np.array([0, 1], np.int32)
    blend = (logits[0] + logits[1]) / 2
    a = acc(jnp.asarray(blend), jnp.asarray(labels), jnp.ones((2,)))
    assert float(a) == 100.0
