"""Crash-resume: training continues from the last-epoch checkpoint with
history, controller state, LR, and epoch counter restored (new capability
vs the reference, SURVEY §5)."""

import os

import numpy as np
import pandas as pd
import pytest

from greedy_multimodal_learning_tpu import config as cfg
from greedy_multimodal_learning_tpu.data.synthetic import make_synthetic_modelnet


def _bind(root, n_epochs, resume=False, momentum=0.0):
    cfg.clear_config()
    cfg.parse_config(
        f"""
        MMTM_MVCNN.num_views = 2
        MMTM_MVCNN.nclasses = 4
        get_mvdcndata.root_dir = '{root}'
        get_mvdcndata.num_views = 2
        get_mvdcndata.specific_views = [0, 1]
        train.batch_size = 4
        train.lr = 0.05
        train.momentum = {momentum}
        train.callbacks = ['Bias_Mitigation_Strong']
        Bias_Mitigation_Strong.starting_epoch = 1
        Bias_Mitigation_Strong.epsilon = 0.01
        Bias_Mitigation_Strong.curation_windowsize = 3
        training_loop.n_epochs = {n_epochs}
        training_loop.resume = {resume}
        """
    )


# momentum=0.9 exercises the optimizer-moment restore from the .pt sidecar:
# a resume that silently reinitialized the momentum trace would diverge from
# the uninterrupted trajectory below.
@pytest.mark.parametrize("momentum", [0.0, 0.9])
def test_resume_continues_epoch_count(tmp_path, momentum):
    root = make_synthetic_modelnet(str(tmp_path / "data"), n_train=8, n_test=4, num_views=2, image_size=32)
    save = str(tmp_path / "run")
    os.makedirs(save)
    from train import train

    _bind(root, n_epochs=3, momentum=momentum)
    train(save)
    df1 = pd.read_csv(os.path.join(save, "history.csv"))
    assert df1["epoch"].tolist() == [1, 2]

    # resume with a larger budget: epochs 3..4 are appended
    _bind(root, n_epochs=5, resume=True, momentum=momentum)
    train(save)
    df2 = pd.read_csv(os.path.join(save, "history.csv"))
    assert df2["epoch"].tolist() == [1, 2, 3, 4]
    # earlier rows preserved verbatim
    np.testing.assert_allclose(df2["loss"].iloc[:2], df1["loss"], rtol=1e-6)

    # exactness: an uninterrupted 5-epoch run yields the same trajectory
    # (stateless per-epoch data shuffle + full state restore + host
    # scheduler replay)
    save_full = str(tmp_path / "run_full")
    os.makedirs(save_full)
    _bind(root, n_epochs=5, momentum=momentum)
    train(save_full)
    df3 = pd.read_csv(os.path.join(save_full, "history.csv"))
    assert df3["epoch"].tolist() == [1, 2, 3, 4]
    np.testing.assert_allclose(df2["loss"], df3["loss"], rtol=1e-5)
    np.testing.assert_allclose(df2["val_acc"], df3["val_acc"], rtol=1e-6)
    cfg.clear_config()


def test_resume_with_checkpoint_every_truncates_history(tmp_path):
    """checkpoint_every>1: the sidecar can be older than history.csv.  The
    restored weights are authoritative — resume must truncate the replayed
    history to the checkpoint's epoch and re-train from there, matching an
    uninterrupted run exactly (not silently pair stale weights with newer
    scheduler/stopping state)."""
    root = make_synthetic_modelnet(str(tmp_path / "data"), n_train=8, n_test=4, num_views=2, image_size=32)
    save = str(tmp_path / "run")
    os.makedirs(save)
    from train import train

    def bind(n_epochs, resume=False):
        _bind(root, n_epochs=n_epochs, resume=resume)
        cfg.parse_config("training_loop.checkpoint_every = 2")

    bind(n_epochs=6)  # runs epochs 1..5; last checkpoint lands at epoch 4
    train(save)
    df1 = pd.read_csv(os.path.join(save, "history.csv"))
    assert df1["epoch"].tolist() == [1, 2, 3, 4, 5]

    bind(n_epochs=8, resume=True)  # resumes from epoch-4 weights
    train(save)
    df2 = pd.read_csv(os.path.join(save, "history.csv"))
    assert df2["epoch"].tolist() == [1, 2, 3, 4, 5, 6, 7]
    # epochs 1..4 preserved; epoch 5 re-trained from the epoch-4 state
    np.testing.assert_allclose(df2["loss"].iloc[:4], df1["loss"].iloc[:4], rtol=1e-6)

    save_full = str(tmp_path / "run_full")
    os.makedirs(save_full)
    bind(n_epochs=8)
    train(save_full)
    df3 = pd.read_csv(os.path.join(save_full, "history.csv"))
    np.testing.assert_allclose(df2["loss"], df3["loss"], rtol=1e-5)
    np.testing.assert_allclose(df2["val_acc"], df3["val_acc"], rtol=1e-6)

    # structured history stays epoch-aligned across the resume: the pickle's
    # non-scalar keys (train_indices, ...) must cover every epoch, not just
    # the post-resume ones (analysis pipeline indexes them by epoch)
    import pickle

    with open(os.path.join(save, "history.pickle"), "rb") as f:
        H = pickle.load(f)
    assert len(H["train_indices"]) == len(H["epoch"]) == 7
    cfg.clear_config()


def test_resume_weakest_controller_target_preserved(tmp_path):
    """Weakest-controller resume: the host-designated curation target is
    restored from the controller sidecar (Bias_Mitigation_Weakest must not
    wipe it at train begin), so a resumed run matches an uninterrupted one."""
    root = make_synthetic_modelnet(str(tmp_path / "data"), n_train=8, n_test=4, num_views=2, image_size=32)
    from train import train

    def bind(n_epochs, resume=False):
        cfg.clear_config()
        cfg.parse_config(
            f"""
            MMTM_MVCNN.num_views = 2
            MMTM_MVCNN.nclasses = 4
            get_mvdcndata.root_dir = '{root}'
            get_mvdcndata.num_views = 2
            get_mvdcndata.specific_views = [0, 1]
            train.batch_size = 4
            train.lr = 0.05
            train.callbacks = ['Bias_Mitigation_Weakest']
            Bias_Mitigation_Weakest.starting_epoch = 1
            Bias_Mitigation_Weakest.curation_windowsize = 2
            Bias_Mitigation_Weakest.duty_period = 4
            training_loop.n_epochs = {n_epochs}
            training_loop.resume = {resume}
            """
        )

    save = str(tmp_path / "run")
    os.makedirs(save)
    bind(n_epochs=3)
    train(save)
    df1 = pd.read_csv(os.path.join(save, "history.csv"))
    assert df1["epoch"].tolist() == [1, 2]

    bind(n_epochs=5, resume=True)
    train(save)
    df2 = pd.read_csv(os.path.join(save, "history.csv"))
    assert df2["epoch"].tolist() == [1, 2, 3, 4]

    save_full = str(tmp_path / "run_full")
    os.makedirs(save_full)
    bind(n_epochs=5)
    train(save_full)
    df3 = pd.read_csv(os.path.join(save_full, "history.csv"))
    np.testing.assert_allclose(df2["loss"], df3["loss"], rtol=1e-5)
    np.testing.assert_allclose(df2["val_acc"], df3["val_acc"], rtol=1e-6)
    cfg.clear_config()
