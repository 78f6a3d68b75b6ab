"""Orbax async full-state checkpointing: round-trip including optimizer
moments and controller state, and resume through the training loop."""

import os

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

from greedy_multimodal_learning_tpu import config as cfg
from greedy_multimodal_learning_tpu.data.synthetic import make_synthetic_modelnet
from greedy_multimodal_learning_tpu.engine import create_train_state, make_optimizer
from greedy_multimodal_learning_tpu.engine.checkpoint import OrbaxCheckpointer, state_to_tree
from greedy_multimodal_learning_tpu.models import MMTMMVCNN


def test_orbax_roundtrip(tmp_path):
    model = MMTMMVCNN(nclasses=4, num_towers=2)
    optimizer = make_optimizer(lr=0.1, momentum=0.9)
    sample = jnp.zeros((2, 2, 32, 32, 3), jnp.float32)
    state = create_train_state(model, optimizer, jax.random.PRNGKey(0), sample)
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    state = state.replace(controller=state.controller.replace(M_main=jnp.asarray([1.5, 2.5])))

    ckpt = OrbaxCheckpointer(str(tmp_path / "orbax"))
    ckpt.save(7, state)
    ckpt.wait()
    assert ckpt.latest_step() == 7

    fresh = create_train_state(model, optimizer, jax.random.PRNGKey(1), sample)
    restored, step = ckpt.restore_latest(fresh)
    assert step == 7
    assert int(restored.step) == 7
    np.testing.assert_allclose(np.asarray(restored.controller.M_main), [1.5, 2.5])
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # optimizer moments restored structurally
    assert jax.tree_util.tree_structure(restored.opt_state) == jax.tree_util.tree_structure(state.opt_state)


def test_training_loop_orbax_snapshots(tmp_path):
    root = make_synthetic_modelnet(str(tmp_path / "data"), n_train=8, n_test=4, num_views=2, image_size=32)
    save = str(tmp_path / "run")
    os.makedirs(save)
    cfg.clear_config()
    cfg.parse_config(
        f"""
        MMTM_MVCNN.num_views = 2
        MMTM_MVCNN.nclasses = 4
        get_mvdcndata.root_dir = '{root}'
        get_mvdcndata.num_views = 2
        get_mvdcndata.specific_views = [0, 1]
        train.batch_size = 4
        train.callbacks = ['Bias_Mitigation_Random']
        training_loop.n_epochs = 3
        training_loop.orbax_dir = 'orbax'
        """
    )
    from train import train

    train(save)
    cfg.clear_config()
    df = pd.read_csv(os.path.join(save, "history.csv"))
    assert df["epoch"].tolist() == [1, 2]
    snap_dir = os.path.join(save, "orbax")
    assert os.path.isdir(snap_dir)
    ckpt = OrbaxCheckpointer(snap_dir)
    assert ckpt.latest_step() == 2
