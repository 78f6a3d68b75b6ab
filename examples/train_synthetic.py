#!/usr/bin/env python3
"""Self-contained quickstart: guided balanced training on synthetic
ModelNet-shaped data (no dataset download needed), then the full
conditional-utilization-rate pipeline.

    python3 examples/train_synthetic.py /tmp/gml_demo
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from greedy_multimodal_learning_tpu import config as cfg
from greedy_multimodal_learning_tpu.data.synthetic import make_synthetic_modelnet


def main(workdir):
    data = make_synthetic_modelnet(
        os.path.join(workdir, "data"), n_train=64, n_test=16, num_views=2, image_size=64, nclasses=4
    )
    save = os.path.join(workdir, "guided")
    os.makedirs(save, exist_ok=True)

    common = f"""
    MMTM_MVCNN.num_views = 2
    MMTM_MVCNN.nclasses = 4
    get_mvdcndata.root_dir = '{data}'
    get_mvdcndata.num_views = 2
    get_mvdcndata.specific_views = [0, 1]
    """

    # --- guided training ---
    cfg.clear_config()
    cfg.parse_config(common)
    cfg.parse_config(
        """
        train.batch_size = 8
        train.lr = 0.01
        train.callbacks = ['CompletedStopping', 'ReduceLROnPlateau_PyTorch', 'Bias_Mitigation_Strong']
        Bias_Mitigation_Strong.starting_epoch = 1
        Bias_Mitigation_Strong.epsilon = 0.005
        Bias_Mitigation_Strong.curation_windowsize = 3
        training_loop.n_epochs = 6
        """
    )
    from train import train

    train(save)

    # --- recording pass over the train split ---
    cfg.clear_config()
    cfg.parse_config(common)
    cfg.parse_config(
        f"""
        MMTM_MVCNN.saving_mmtm_squeeze_array = True
        get_mvdcndata.valid_size = 0
        eval_.target_data_split = 'train'
        eval_.batch_size = 8
        eval_.pretrained_weights_path = '{os.path.join(save, "model_best_val.pt")}'
        evalution_loop.save_with_structure = True
        """
    )
    from eval import eval_

    eval_(save)

    # --- mmtm-off eval: conditional utilization rate ---
    cfg.clear_config()
    cfg.parse_config(common)
    cfg.parse_config(
        f"""
        MMTM_MVCNN.mmtm_off = True
        MMTM_MVCNN.mmtm_rescale_eval_file_path = '{os.path.join(save, "eval_history_batch")}'
        MMTM_MVCNN.mmtm_rescale_training_file_path = '{save}'
        eval_.target_data_split = 'test'
        eval_.batch_size = 8
        eval_.pretrained_weights_path = '{os.path.join(save, "model_best_val.pt")}'
        """
    )
    save_off = os.path.join(workdir, "mmtm_off")
    os.makedirs(save_off, exist_ok=True)
    eval_(save_off)

    import pandas as pd

    hist = pd.read_csv(os.path.join(save, "history.csv"))
    off = pd.read_csv(os.path.join(save_off, "eval_history_batch", "history.csv"))
    print("\n=== guided training ===")
    print(hist[["epoch", "loss", "acc", "val_acc", "test_acc"]].to_string(index=False))
    print("\n=== conditional utilization (cross-modal flow off) ===")
    print(off[["test_acc", "test_acc_modal_0", "test_acc_modal_1"]].to_string(index=False))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/gml_demo")
