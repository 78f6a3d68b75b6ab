"""BN-folding transform (engine/fold_bn.py): eval logits must be exactly
preserved (up to float reassociation), and the folded BN must be an
identity-with-bias (scale 1, mean 0, rsqrt(var+eps) == 1)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from greedy_multimodal_learning_tpu.data.transforms import preprocess
from greedy_multimodal_learning_tpu.engine import create_train_state, make_optimizer
from greedy_multimodal_learning_tpu.engine.fold_bn import fold_batchnorm
from greedy_multimodal_learning_tpu.models import MMTMMVCNN


@pytest.fixture(scope="module")
def trained_state():
    """A state with non-trivial running stats: run a few train-mode
    forwards so BN buffers move away from (0, 1)."""
    model = MMTMMVCNN(nclasses=5, num_towers=2, dtype=jnp.float32)
    sample = jnp.zeros((4, 2, 32, 32, 3), jnp.float32)
    state = create_train_state(model, make_optimizer(lr=0.1), jax.random.PRNGKey(0), sample)
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(0.5, 1.2, (4, 2, 32, 32, 3)), jnp.float32)
    batch_stats, mmtm = state.batch_stats, state.mmtm
    for _ in range(3):
        _, mut = model.apply(
            {"params": state.params, "batch_stats": batch_stats, "mmtm": mmtm},
            x, train=True, valid_mask=jnp.ones((4,)),
            mutable=["batch_stats", "mmtm"],
            rngs={"flip": jax.random.PRNGKey(1)},
        )
        batch_stats, mmtm = mut["batch_stats"], mut["mmtm"]
    return model, state.replace(batch_stats=batch_stats), x


def _eval_logits(model, params, batch_stats, mmtm, x):
    (blend, logits, _, _), _ = model.apply(
        {"params": params, "batch_stats": batch_stats, "mmtm": mmtm},
        x, train=False, valid_mask=jnp.ones((x.shape[0],)), mutable=["mmtm"],
    )
    return np.asarray(blend, np.float32)


def test_folded_eval_logits_match(trained_state):
    model, state, x = trained_state
    fp, fs = fold_batchnorm(state.params, state.batch_stats)
    a = _eval_logits(model, state.params, state.batch_stats, state.mmtm, x)
    b = _eval_logits(model, fp, fs, state.mmtm, x)
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_folded_bn_is_identity(trained_state):
    model, state, _ = trained_state
    fp, fs = fold_batchnorm(state.params, state.batch_stats)
    bn_p = fp["net_view_0"]["bn1"]
    bn_s = fs["net_view_0"]["bn1"]
    np.testing.assert_array_equal(np.asarray(bn_p["scale"]), 1.0)
    np.testing.assert_array_equal(np.asarray(bn_s["mean"]), 0.0)
    inv = 1.0 / np.sqrt(np.asarray(bn_s["var"]) + 1e-5)
    np.testing.assert_allclose(inv, 1.0, rtol=1e-6)
    # kernels actually changed (stats were non-trivial)
    assert not np.allclose(
        np.asarray(fp["net_view_0"]["conv1"]["kernel"]),
        np.asarray(state.params["net_view_0"]["conv1"]["kernel"]),
    )


def test_fold_does_not_mutate_inputs(trained_state):
    model, state, _ = trained_state
    before = np.asarray(state.params["net_view_0"]["conv1"]["kernel"]).copy()
    fold_batchnorm(state.params, state.batch_stats)
    np.testing.assert_array_equal(
        before, np.asarray(state.params["net_view_0"]["conv1"]["kernel"])
    )
    assert float(np.asarray(state.batch_stats["net_view_0"]["bn1"]["mean"]).sum()) != 0.0
