"""The algorithm learns: guided training on class-separable synthetic data
drives train accuracy toward 100%, and the guided controller actually
enters curation windows (the paper's mechanism, reference:
src/callbacks.py:240-263)."""

import os

import numpy as np
import pandas as pd
import pytest

from greedy_multimodal_learning_tpu import config as cfg
from greedy_multimodal_learning_tpu.data.synthetic import make_synthetic_modelnet


@pytest.mark.slow
def test_guided_training_learns(tmp_path):
    root = make_synthetic_modelnet(
        str(tmp_path / "data"), n_train=32, n_test=8, num_views=2, image_size=32, nclasses=4
    )
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
        get_mvdcndata.valid_size = 0.25
        train.batch_size = 8
        train.lr = 0.01
        train.callbacks = ['CompletedStopping', 'ReduceLROnPlateau_PyTorch', 'Bias_Mitigation_Strong']
        CompletedStopping.patience = 5
        ReduceLROnPlateau_PyTorch.metric = 'loss'
        Bias_Mitigation_Strong.epsilon = 0.005
        Bias_Mitigation_Strong.curation_windowsize = 3
        Bias_Mitigation_Strong.starting_epoch = 1
        training_loop.n_epochs = 13
        """
    )
    from train import train

    train(save)
    cfg.clear_config()

    df = pd.read_csv(os.path.join(save, "history.csv"))
    # synthetic classes are linearly separable brightness patterns: the
    # model must fit the train split quickly
    assert df["acc"].iloc[-1] > 90.0, df["acc"].tolist()
    assert df["loss"].iloc[-1] < df["loss"].iloc[0]
    # validation tracks (same patterns)
    assert df["val_acc"].iloc[-1] > 60.0, df["val_acc"].tolist()
