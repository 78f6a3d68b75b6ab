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


def _mini_loaders(tmp, batch=4):
    from greedy_multimodal_learning_tpu.data import BatchPipeline, MultiviewModelNet
    from greedy_multimodal_learning_tpu.data.synthetic import make_synthetic_modelnet

    root = make_synthetic_modelnet(str(tmp), n_train=12, n_test=8, num_views=2,
                                   image_size=32, nclasses=5)
    train_ds = MultiviewModelNet(root, "train", specific_view=[0, 1])
    test_ds = MultiviewModelNet(root, "test", specific_view=[0, 1])
    return (
        BatchPipeline(train_ds, range(12), batch, shuffle=True, seed=5, prefetch=0),
        BatchPipeline(test_ds, range(8), batch, shuffle=False, prefetch=0),
    )


def test_trainer_fold_bn_eval_equivalence(tmp_path):
    """An eval pass with fold_bn_eval=True must produce the same metrics as
    unfolded (up to float reassociation), identical recorded indices, and
    must leave the trainer's params/batch_stats untouched afterwards."""
    from greedy_multimodal_learning_tpu.engine import create_train_state, make_optimizer
    from greedy_multimodal_learning_tpu.engine.framework import Trainer

    _, test_pipe = _mini_loaders(tmp_path)
    results = {}
    for fold in (False, True):
        model = MMTMMVCNN(nclasses=5, num_towers=2, dtype=jnp.float32)
        opt = make_optimizer(lr=0.1)
        state = create_train_state(model, opt, jax.random.PRNGKey(0),
                                   jnp.zeros((4, 2, 32, 32, 3), jnp.float32))
        trainer = Trainer(model=model, optimizer=opt, state=state,
                          fold_bn_eval=fold, verbose=False)
        before_params = trainer.state.params
        out = trainer._eval_generator(test_pipe, "test")
        assert trainer.state.params is before_params, "fold must restore params"
        results[fold] = out
    assert results[True].keys() == results[False].keys()
    np.testing.assert_allclose(results[True]["test_loss"], results[False]["test_loss"],
                               rtol=1e-4, atol=1e-4)
    assert results[True]["test_acc"] == results[False]["test_acc"]
    np.testing.assert_array_equal(results[True]["test_indices"], results[False]["test_indices"])


def test_trainer_fold_cache_invalidates_on_new_params(tmp_path):
    """The per-pass fold cache must recompute when params change (each
    train epoch) and reuse the folded trees while they do not."""
    from greedy_multimodal_learning_tpu.engine import create_train_state, make_optimizer
    from greedy_multimodal_learning_tpu.engine.framework import Trainer

    model = MMTMMVCNN(nclasses=5, num_towers=2, dtype=jnp.float32)
    opt = make_optimizer(lr=0.1)
    state = create_train_state(model, opt, jax.random.PRNGKey(0),
                               jnp.zeros((4, 2, 32, 32, 3), jnp.float32))
    trainer = Trainer(model=model, optimizer=opt, state=state,
                      fold_bn_eval=True, verbose=False)
    fp1, fs1 = trainer._folded_params_stats()
    fp2, fs2 = trainer._folded_params_stats()
    assert fp1 is fp2 and fs1 is fs2  # cache hit on identical trees
    # params object changes (as after a train step) -> fresh fold
    trainer.state = trainer.state.replace(
        params=jax.tree_util.tree_map(lambda x: x + 0.0, trainer.state.params)
    )
    fp3, _ = trainer._folded_params_stats()
    assert fp3 is not fp1


def test_training_run_with_fold_matches_unfolded(tmp_path):
    """Full train_loop with fold_bn_eval on: the TRAIN trajectory must be
    bit-identical to the unfolded run (folding swaps state for eval passes
    only), and val/test metrics equal within float reassociation."""
    from greedy_multimodal_learning_tpu.engine import create_train_state, make_optimizer
    from greedy_multimodal_learning_tpu.engine.framework import Trainer

    from greedy_multimodal_learning_tpu.engine.callbacks import LambdaCallback

    hists = {}
    for fold in (False, True):
        train_pipe, test_pipe = _mini_loaders(tmp_path / f"d{fold}")
        model = MMTMMVCNN(nclasses=5, num_towers=2, dtype=jnp.float32)
        opt = make_optimizer(lr=0.05)
        state = create_train_state(model, opt, jax.random.PRNGKey(0),
                                   jnp.zeros((4, 2, 32, 32, 3), jnp.float32))
        trainer = Trainer(model=model, optimizer=opt, state=state,
                          fold_bn_eval=fold, verbose=False)
        logs = []
        cap = LambdaCallback(on_epoch_end=lambda epoch, log: logs.append(dict(log)))
        trainer.train_loop(
            train_pipe, valid_generator=test_pipe, test_generator=test_pipe,
            epochs=2, steps_per_epoch=len(train_pipe),
            validation_steps=len(test_pipe), test_steps=len(test_pipe),
            callbacks=[cap])
        hists[fold] = logs
    for a, b in zip(hists[False], hists[True]):
        assert a["loss"] == b["loss"], "train metrics must be bit-identical"
        assert a["acc"] == b["acc"]
        np.testing.assert_allclose(a["val_loss"], b["val_loss"], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(a["test_loss"], b["test_loss"], rtol=1e-4, atol=1e-4)
        assert a["val_acc"] == b["val_acc"] and a["test_acc"] == b["test_acc"]


def test_sweep_fold_bn_equivalence(tmp_path):
    """eval_sweep's default BN folding must not change sweep metrics."""
    from greedy_multimodal_learning_tpu.engine import create_train_state, make_optimizer
    from greedy_multimodal_learning_tpu.engine.sweep import eval_sweep

    _, test_pipe = _mini_loaders(tmp_path)
    model = MMTMMVCNN(nclasses=5, num_towers=2, dtype=jnp.float32)
    trees = []
    for seed in (0, 1):
        state = create_train_state(model, make_optimizer(lr=0.1), jax.random.PRNGKey(seed),
                                   jnp.zeros((4, 2, 32, 32, 3), jnp.float32))
        trees.append({"params": state.params, "batch_stats": state.batch_stats,
                      "mmtm": state.mmtm})
    folded = eval_sweep(model, trees, test_pipe, fold_bn=True)
    stock = eval_sweep(model, trees, test_pipe, fold_bn=False)
    assert len(folded) == len(stock) == 2
    for f, s in zip(folded, stock):
        assert f["acc"] == s["acc"]
        np.testing.assert_allclose(f["loss"], s["loss"], rtol=1e-4, atol=1e-4)
