"""Run-to-run determinism: identical config + seeds -> identical training
trajectory (new guarantee vs the reference, whose DataLoader workers and
CUDA kernels are nondeterministic)."""

import os

import pandas as pd

from greedy_multimodal_learning_tpu import config as cfg
from greedy_multimodal_learning_tpu.data.synthetic import make_synthetic_modelnet


def _run(root, save):
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
        train.callbacks = ['Bias_Mitigation_Random']
        training_loop.n_epochs = 3
        """
    )
    from train import train

    os.makedirs(save, exist_ok=True)
    train(save)
    cfg.clear_config()
    return pd.read_csv(os.path.join(save, "history.csv"))


def test_same_seed_same_trajectory(tmp_path):
    root = make_synthetic_modelnet(str(tmp_path / "data"), n_train=8, n_test=4, num_views=2, image_size=32)
    df1 = _run(root, str(tmp_path / "r1"))
    df2 = _run(root, str(tmp_path / "r2"))
    for col in ["loss", "acc", "val_loss", "val_acc", "test_loss", "test_acc"]:
        assert df1[col].tolist() == df2[col].tolist(), col
