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


def test_3dcnn_random_arm_and_utilization_pipeline(tmp_path):
    """Full 3-modality pipeline through the CLI config surface: random-arm
    training -> squeeze recording (configs/recording_3dcnn.gin) ->
    cross-modal-flow-off eval (configs/eval_3dcnn.gin).  This is the
    N-modality generalization of the reference's README.md:12-23 workflow;
    no reference equivalent exists (it hardcodes 2 modalities)."""
    from greedy_multimodal_learning_tpu.data.nvgesture import make_synthetic_nvgesture

    root = make_synthetic_nvgesture(
        str(tmp_path / "data"), n_train=8, n_test=4, num_modalities=3, frames=4, image_size=16, nclasses=4
    )
    run = str(tmp_path / "run3d")
    os.makedirs(run)
    common = f"""
        MMTM_3DCNN.nclasses = 4
        MMTM_3DCNN.width_multiplier = 0.25
        get_nvgesturedata.root_dir = '{root}'
    """

    cfg.clear_config()
    cfg.parse_config_file("configs/training_3dcnn_random.gin")
    cfg.parse_config(common + "train.batch_size = 4\ntraining_loop.n_epochs = 3")
    from train import train

    train(run)
    ckpt = os.path.join(run, "model_best_val.pt")
    assert os.path.exists(ckpt)

    # recording pass: train-split squeeze maps into history.pickle
    cfg.clear_config()
    cfg.parse_config_file("configs/recording_3dcnn.gin")
    cfg.parse_config(common + f"eval_.batch_size = 4\neval_.pretrained_weights_path = '{ckpt}'")
    from eval import eval_

    eval_(run)
    assert os.path.exists(os.path.join(run, "eval_history_batch", "history.pickle"))

    # flow-off pass: per-modality utilization accuracies
    off = str(tmp_path / "off")
    cfg.clear_config()
    cfg.parse_config_file("configs/eval_3dcnn.gin")
    cfg.parse_config(
        common
        + f"""
        eval_.batch_size = 4
        eval_.pretrained_weights_path = '{ckpt}'
        MMTM_3DCNN.mmtm_rescale_eval_file_path = '{os.path.join(run, "eval_history_batch")}'
        MMTM_3DCNN.mmtm_rescale_training_file_path = '{run}'
        """
    )
    eval_(off)
    off_df = pd.read_csv(os.path.join(off, "eval_history_batch", "history.csv"))
    for m in range(3):
        col = f"test_acc_modal_{m}"
        assert col in off_df.columns
        assert np.isfinite(off_df[col].iloc[-1])
    cfg.clear_config()
