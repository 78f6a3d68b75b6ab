"""Oracle tests for the trajectory gatekeepers (VERDICT r1 item 6).

* ReduceLROnPlateau_PyTorch vs the real torch.optim.lr_scheduler
  .ReduceLROnPlateau over random + adversarial metric sequences
  (reference instantiates torch's scheduler with mode='min', factor,
  patience, threshold=0.001 rel, cooldown=0, min_lr=1e-6, eps=1e-8 —
  reference: src/callbacks.py:333-348),
* CompletedStopping's cumulative ==100 counter (reference:
  src/callbacks.py:305-330 — the counter never resets, so non-consecutive
  100s accumulate),
* the NaN-loss training abort (reference: src/framework.py:321-322).
"""

import numpy as np
import pytest

from greedy_multimodal_learning_tpu.engine.callbacks import (
    CompletedStopping,
    ReduceLROnPlateau_PyTorch,
)


class _FakeTrainer:
    def __init__(self, lr):
        self.lr = lr
        self.stop_training = False

    def get_lr(self):
        return self.lr

    def set_lr(self, lr):
        self.lr = lr


def _torch_lr_trajectory(metrics, lr0, factor, patience):
    import torch

    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=lr0)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=factor, patience=patience,
        threshold=0.001, threshold_mode="rel", cooldown=0, min_lr=1e-6, eps=1e-8,
    )
    out = []
    for m in metrics:
        sched.step(float(m))
        out.append(opt.param_groups[0]["lr"])
    return out


def _ours_lr_trajectory(metrics, lr0, factor, patience):
    trainer = _FakeTrainer(lr0)
    cb = ReduceLROnPlateau_PyTorch(metric="loss", factor=factor, patience=patience)
    cb.set_model_pytoune(trainer)
    cb.on_train_begin({})
    out = []
    for epoch, m in enumerate(metrics, 1):
        cb.on_epoch_end(epoch, {"loss": float(m)})
        out.append(trainer.get_lr())
    return out


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_reduce_lr_matches_torch_random_walks(seed):
    rng = np.random.default_rng(seed)
    # noisy plateauing loss: improvements early, stagnation later
    n = 120
    metrics = 1.0 / (1.0 + 0.2 * np.arange(n)) + rng.normal(0, 0.02, n).cumsum() * 0.01
    ours = _ours_lr_trajectory(metrics, 0.1, 0.3, 10)
    torch_ = _torch_lr_trajectory(metrics, 0.1, 0.3, 10)
    np.testing.assert_allclose(ours, torch_, rtol=0, atol=0)


def test_reduce_lr_matches_torch_threshold_edges():
    # values exactly at / around the 0.1% relative-improvement boundary
    metrics = [1.0]
    for frac in (0.9995, 0.999, 0.99899, 1.0, 0.5, 0.5 * 0.999, 0.5 * 0.99899):
        metrics.append(metrics[0] * frac)
    metrics += [metrics[-1]] * 30  # long plateau -> repeated reductions
    ours = _ours_lr_trajectory(metrics, 0.1, 0.3, 3)
    torch_ = _torch_lr_trajectory(metrics, 0.1, 0.3, 3)
    np.testing.assert_allclose(ours, torch_, rtol=0, atol=0)


def test_reduce_lr_min_lr_clamp_matches_torch():
    # plateau long enough to hit the 1e-6 floor and the eps no-op guard
    metrics = [1.0] * 200
    ours = _ours_lr_trajectory(metrics, 0.1, 0.3, 2)
    torch_ = _torch_lr_trajectory(metrics, 0.1, 0.3, 2)
    np.testing.assert_allclose(ours, torch_, rtol=0, atol=0)
    assert ours[-1] == pytest.approx(1e-6)


def test_completed_stopping_cumulative_counter():
    """The reference counter accumulates over the whole run (no reset):
    non-consecutive acc==100 epochs count toward patience."""
    trainer = _FakeTrainer(0.1)
    cb = CompletedStopping(monitor="acc", patience=3, verbose=False)
    cb.set_model_pytoune(trainer)
    cb.on_train_begin({})
    seq = [100, 90, 100, 90, 90, 100]  # third 100 at epoch 6 -> stop
    stopped_at = None
    for epoch, acc in enumerate(seq, 1):
        cb.on_epoch_end(epoch, {"acc": acc})
        if trainer.stop_training:
            stopped_at = epoch
            break
    assert stopped_at == 6
    assert cb.stopped_epoch == 6


def test_completed_stopping_requires_exact_100():
    trainer = _FakeTrainer(0.1)
    cb = CompletedStopping(monitor="acc", patience=2, verbose=False)
    cb.set_model_pytoune(trainer)
    cb.on_train_begin({})
    for epoch, acc in enumerate([99.999, 99.9999, 100.0], 1):
        cb.on_epoch_end(epoch, {"acc": acc})
    assert not trainer.stop_training  # only one exact 100 so far


def test_nan_loss_aborts_training(tmp_path):
    """A NaN loss stops the loop at that epoch (reference:
    src/framework.py:321-322)."""
    import jax
    import jax.numpy as jnp

    from greedy_multimodal_learning_tpu.data.synthetic import make_synthetic_modelnet
    from greedy_multimodal_learning_tpu.data import MultiviewModelNet, BatchPipeline
    from greedy_multimodal_learning_tpu.engine import create_train_state, make_optimizer
    from greedy_multimodal_learning_tpu.engine.framework import Trainer
    from greedy_multimodal_learning_tpu.models import MMTMMVCNN

    root = make_synthetic_modelnet(str(tmp_path / "d"), n_train=8, n_test=4, num_views=2, image_size=16, nclasses=4)
    ds = MultiviewModelNet(root, "train", specific_view=[0, 1])
    pipe = BatchPipeline(ds, range(8), batch_size=4, shuffle=False, prefetch=0)
    model = MMTMMVCNN(nclasses=4, num_towers=2)
    opt = make_optimizer(lr=0.1)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), jnp.zeros((4, 2, 16, 16, 3)))
    # poison one parameter leaf -> NaN loss from step 1
    state = state.replace(
        params=jax.tree_util.tree_map(lambda x: jnp.full_like(x, jnp.nan), state.params)
    )
    trainer = Trainer(model=model, optimizer=opt, state=state)

    epochs_seen = []
    from greedy_multimodal_learning_tpu.engine.callbacks import LambdaCallback

    trainer.train_loop(
        pipe,
        valid_generator=pipe,
        test_generator=pipe,
        epochs=5,
        steps_per_epoch=len(pipe),
        validation_steps=len(pipe),
        test_steps=len(pipe),
        callbacks=[LambdaCallback(on_epoch_end=lambda epoch, logs: epochs_seen.append(epoch))],
    )
    assert epochs_seen == [1]  # aborted after the NaN epoch, not 5


class _FakeWrapper:
    """Records save_weights calls (stand-in for the Trainer handle the
    reference's ModelCheckpoint drives, src/callbacks.py:426-452)."""

    def __init__(self):
        self.saves = []

    def save_weights(self, filepath):
        self.saves.append(filepath)


def _ckpt(monitor, mode="auto", **kw):
    from greedy_multimodal_learning_tpu.engine.callbacks import ModelCheckpoint

    cb = ModelCheckpoint("out.pt", monitor=monitor, mode=mode, save_best_only=True, **kw)
    cb.model_pytoune = _FakeWrapper()
    return cb


def test_model_checkpoint_auto_mode_inference():
    """auto mode: 'acc' monitors maximize, everything else minimizes
    (reference: src/callbacks.py:398-413)."""
    acc = _ckpt("val_acc")
    for epoch, v in enumerate([10.0, 30.0, 20.0, 30.0, 31.0], 1):
        acc.on_epoch_end(epoch, {"val_acc": v})
    # saves only on STRICT improvement: 10, 30, 31
    assert len(acc.model_pytoune.saves) == 3

    loss = _ckpt("val_loss")
    for epoch, v in enumerate([5.0, 4.0, 4.5, 4.0], 1):
        loss.on_epoch_end(epoch, {"val_loss": v})
    assert len(loss.model_pytoune.saves) == 2  # 5, 4


def test_model_checkpoint_missing_metric_skips():
    cb = _ckpt("val_acc")
    cb.on_epoch_end(1, {"other": 1.0})
    assert cb.model_pytoune.saves == []
    # unaffected best: a later real value still saves
    cb.on_epoch_end(2, {"val_acc": 1.0})
    assert len(cb.model_pytoune.saves) == 1


def test_model_checkpoint_period():
    cb = _ckpt("val_acc", period=2)
    for epoch, v in enumerate([1.0, 2.0, 3.0, 4.0], 1):
        cb.on_epoch_end(epoch, {"val_acc": v})
    # only epochs 2 and 4 are eligible
    assert len(cb.model_pytoune.saves) == 2


def test_metric_reader_budget_disables_device_fetches():
    """_MetricReader: host scalars are always free; device-value fetches
    stop once the cumulative budget is spent (degraded-link guard)."""
    import jax.numpy as jnp

    from greedy_multimodal_learning_tpu.engine.callbacks import _MetricReader

    r = _MetricReader(max_total_seconds=0.0)  # budget already exhausted
    assert r(1.5) == 1.5 and r(7) == 7.0  # host values unaffected
    assert r(jnp.float32(2.0)) is None  # device fetch suppressed

    r = _MetricReader(max_total_seconds=10.0)
    assert r(jnp.float32(2.0)) == 2.0  # within budget: fetched
    assert r.spent > 0.0
    r.reset()
    assert r.spent == 0.0
