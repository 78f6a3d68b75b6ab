"""Fused multi-checkpoint eval sweep: vmapped results must equal
per-checkpoint sequential evaluation."""

import numpy as np

import jax
import jax.numpy as jnp

from greedy_multimodal_learning_tpu.data import BatchPipeline, MultiviewModelNet
from greedy_multimodal_learning_tpu.data.synthetic import make_synthetic_modelnet
from greedy_multimodal_learning_tpu.engine import Trainer, create_train_state, make_optimizer
from greedy_multimodal_learning_tpu.engine.sweep import eval_sweep
from greedy_multimodal_learning_tpu.models import MMTMMVCNN


def test_eval_sweep_matches_sequential(tmp_path):
    root = make_synthetic_modelnet(str(tmp_path), n_train=6, n_test=6, num_views=2, image_size=32)
    ds = MultiviewModelNet(root, "test", specific_view=[0, 1])

    model = MMTMMVCNN(nclasses=4, num_towers=2)
    optimizer = make_optimizer(lr=0.1)
    sample = jnp.zeros((4, 2, 32, 32, 3), jnp.float32)
    s1 = create_train_state(model, optimizer, jax.random.PRNGKey(0), sample)
    s2 = create_train_state(model, optimizer, jax.random.PRNGKey(1), sample)

    trees = [
        {"params": s.params, "batch_stats": s.batch_stats, "mmtm": s.mmtm} for s in (s1, s2)
    ]
    pipe = BatchPipeline(ds, range(6), batch_size=4, shuffle=False)
    swept = eval_sweep(model, trees, pipe)
    assert len(swept) == 2

    # sequential reference via the Trainer's eval path
    for s, res in zip((s1, s2), swept):
        tr = Trainer(model=model, optimizer=optimizer, state=s)
        seq = tr._eval_generator(BatchPipeline(ds, range(6), batch_size=4, shuffle=False), "test")
        np.testing.assert_allclose(res["loss"], seq["test_loss"], rtol=1e-5)
        np.testing.assert_allclose(res["acc"], seq["test_acc"], rtol=1e-5)
        np.testing.assert_allclose(res["acc_modal_0"], seq["test_acc_modal_0"], rtol=1e-5)
    # different checkpoints yield different numbers (sanity)
    assert swept[0]["loss"] != swept[1]["loss"]
