#!/usr/bin/env python3
"""Mechanism demonstration: guided balancing on modality-imbalanced data.

Builds a synthetic 2-view dataset where view 0 carries a strong class
signal and view 1 a weak one — the setting where the paper shows plain
blended training goes greedy on the strong modality.  Trains (a) the guided
controller and (b) no controller, then reports per-modality accuracies and
the controller's curation activity.

    python3 examples/guided_vs_unbalanced.py /tmp/gml_imbalance
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from greedy_multimodal_learning_tpu import config as cfg
from greedy_multimodal_learning_tpu.models.mvcnn import MODELNET40_CLASSNAMES


def make_imbalanced_modelnet(root_dir, n_train=64, n_test=32, image_size=32, nclasses=4, seed=0,
                             strong_contrast=60, weak_contrast=10, noise=24):
    """View 0: strong class-dependent pattern; view 1: weak pattern under
    heavy noise."""
    rng = np.random.default_rng(seed)
    os.makedirs(root_dir, exist_ok=True)
    classnames = MODELNET40_CLASSNAMES[:nclasses]
    meta = {"classnames": classnames, "train": [], "test": []}
    for split, n in (("train", n_train), ("test", n_test)):
        os.makedirs(os.path.join(root_dir, split), exist_ok=True)
        for i in range(n):
            cls = i % nclasses
            model = f"{classnames[cls]}_{split}_{i:04d}"
            meta[split].append({"classname": classnames[cls], "model": model})
            base = rng.integers(0, noise, (2, image_size, image_size, 3)).astype(np.int32) + 100
            # strong signal in view 0, weak in view 1 (same spatial code)
            band = slice(0, image_size // 2)
            base[0, band] += strong_contrast * cls
            base[1, band] += weak_contrast * cls
            np.save(os.path.join(root_dir, split, f"{model}.npy"),
                    np.clip(base, 0, 255).astype(np.uint8))
    with open(os.path.join(root_dir, "metadata.json"), "w") as f:
        json.dump(meta, f)
    return root_dir


def run(root, save, callbacks, n_epochs=12):
    from train import train

    cfg.clear_config()
    cfg.parse_config(
        f"""
        MMTM_MVCNN.num_views = 2
        MMTM_MVCNN.nclasses = 4
        get_mvdcndata.root_dir = '{root}'
        get_mvdcndata.num_views = 2
        get_mvdcndata.specific_views = [0, 1]
        train.batch_size = 8
        train.lr = 0.01
        train.callbacks = {callbacks!r}
        Bias_Mitigation_Strong.epsilon = 0.002
        Bias_Mitigation_Strong.curation_windowsize = 5
        Bias_Mitigation_Strong.starting_epoch = 1
        training_loop.n_epochs = {n_epochs}
        """
    )
    os.makedirs(save, exist_ok=True)
    train(save)
    cfg.clear_config()
    import pandas as pd

    return pd.read_csv(os.path.join(save, "history.csv"))


def main(workdir):
    root = make_imbalanced_modelnet(os.path.join(workdir, "data"))
    guided = run(root, os.path.join(workdir, "guided"), ["Bias_Mitigation_Strong"])
    plain = run(root, os.path.join(workdir, "plain"), [])

    cols = ["test_acc", "test_acc_modal_0", "test_acc_modal_1"]
    print("\n=== final-epoch test metrics (view 0 strong / view 1 weak) ===")
    print("guided :", {c: round(float(guided[c].iloc[-1]), 2) for c in cols})
    print("plain  :", {c: round(float(plain[c].iloc[-1]), 2) for c in cols})
    print("\nweak-modality (view 1) test acc trajectory:")
    print("guided :", [round(float(v), 1) for v in guided["test_acc_modal_1"]])
    print("plain  :", [round(float(v), 1) for v in plain["test_acc_modal_1"]])


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/gml_imbalance")
