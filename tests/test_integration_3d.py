"""End-to-end 3-modality 3D-CNN guided training (BASELINE config 4) on
synthetic clip data through the CLI surface."""

import os

import numpy as np
import pandas as pd

from greedy_multimodal_learning_tpu import config as cfg
from greedy_multimodal_learning_tpu.data.nvgesture import make_synthetic_nvgesture


def test_3dcnn_guided_training(tmp_path):
    root = make_synthetic_nvgesture(
        str(tmp_path / "data"), n_train=8, n_test=4, num_modalities=3, frames=4, image_size=16, nclasses=4
    )
    save = str(tmp_path / "run3d")
    os.makedirs(save)

    cfg.clear_config()
    cfg.parse_config_file("configs/training_3dcnn_guided.gin")
    cfg.parse_config(
        f"""
        MMTM_3DCNN.nclasses = 4
        MMTM_3DCNN.width_multiplier = 0.25
        get_nvgesturedata.root_dir = '{root}'
        train.batch_size = 4
        training_loop.n_epochs = 3
        """
    )
    from train import train

    train(save)

    df = pd.read_csv(os.path.join(save, "history.csv"))
    assert df["epoch"].tolist() == [1, 2]
    for col in ["loss", "acc", "acc_modal_0", "acc_modal_1", "acc_modal_2", "val_acc", "test_acc"]:
        assert col in df.columns, col
    assert np.isfinite(df["loss"]).all()
    assert os.path.exists(os.path.join(save, "model_best_val.pt"))
    cfg.clear_config()
