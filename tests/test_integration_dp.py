"""Data-parallel training through the full CLI surface on the virtual
8-device CPU mesh (BASELINE config 5 mechanics)."""

import os

import numpy as np
import pandas as pd
import pytest

import jax

from greedy_multimodal_learning_tpu import config as cfg
from greedy_multimodal_learning_tpu.data.synthetic import make_synthetic_modelnet


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_data_parallel_training_loop(tmp_path):
    root = make_synthetic_modelnet(str(tmp_path / "data"), n_train=24, n_test=8, num_views=2, image_size=32)
    save = str(tmp_path / "dp")
    os.makedirs(save)
    cfg.clear_config()
    cfg.parse_config(
        f"""
        MMTM_MVCNN.num_views = 2
        MMTM_MVCNN.nclasses = 4
        get_mvdcndata.root_dir = '{root}'
        get_mvdcndata.num_views = 2
        get_mvdcndata.specific_views = [0, 1]
        train.batch_size = 8
        train.lr = 0.05
        train.callbacks = ['Bias_Mitigation_Strong']
        Bias_Mitigation_Strong.starting_epoch = 1
        Bias_Mitigation_Strong.epsilon = 0.01
        Bias_Mitigation_Strong.curation_windowsize = 3
        training_loop.n_epochs = 3
        training_loop.data_parallel = True
        training_loop.model_parallel = 2
        """
    )
    from train import train

    train(save)
    df = pd.read_csv(os.path.join(save, "history.csv"))
    assert df["epoch"].tolist() == [1, 2]
    assert np.isfinite(df["loss"]).all()
    assert np.isfinite(df["val_acc"]).all()
    cfg.clear_config()


def test_eval_loop_data_parallel(tmp_path):
    """evalution_loop with a GSPMD mesh (data_parallel=True): recording eval
    over the mesh produces the same artifact schema as single-device."""
    root = make_synthetic_modelnet(str(tmp_path / "data"), n_train=16, n_test=8, num_views=2, image_size=32)
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
        train.batch_size = 8
        training_loop.n_epochs = 2
        """
    )
    from train import train

    train(save)

    cfg.clear_config()
    cfg.parse_config(
        f"""
        MMTM_MVCNN.num_views = 2
        MMTM_MVCNN.nclasses = 4
        MMTM_MVCNN.saving_mmtm_squeeze_array = True
        get_mvdcndata.root_dir = '{root}'
        get_mvdcndata.num_views = 2
        get_mvdcndata.specific_views = [0, 1]
        get_mvdcndata.valid_size = 0
        eval_.target_data_split = 'train'
        eval_.batch_size = 8
        eval_.pretrained_weights_path = '{save}/model_best_val.pt'
        evalution_loop.save_with_structure = True
        evalution_loop.data_parallel = True
        evalution_loop.model_parallel = 2
        """
    )
    from eval import eval_

    eval_(save)
    import pickle

    with open(os.path.join(save, "eval_history_batch", "history.pickle"), "rb") as f:
        hist = pickle.load(f)
    assert "test_squeezedmaps_array_list" in hist
    assert "test_indices" in hist
    idx = np.concatenate([np.asarray(b) for b in [hist["test_indices"][0]]]).ravel()
    assert sorted(idx.tolist()) == list(range(16))
    cfg.clear_config()
