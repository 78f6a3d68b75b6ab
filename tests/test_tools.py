"""Data-prep tool: PNG view renders -> metadata.json + per-model npy stacks."""

import json
import subprocess
import sys
import os

import numpy as np


def test_prepare_modelnet40(tmp_path):
    from PIL import Image

    src = tmp_path / "raw"
    for classname in ("chair", "desk"):
        for split in ("train", "test"):
            d = src / classname / split
            d.mkdir(parents=True)
            for model_i in range(2):
                for v in range(3):
                    arr = np.full((16, 16, 3), 10 * v + model_i, np.uint8)
                    Image.fromarray(arr).save(d / f"{classname}_{model_i:04d}.obj_v{v:03d}.png")

    out = tmp_path / "prep"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "tools/prepare_modelnet40.py", str(src), str(out), "--views", "3", "--size", "8"],
        cwd=repo,
        capture_output=True,
        text=True,
    )
    assert r.returncode == 0, r.stderr

    meta = json.load(open(out / "metadata.json"))
    assert meta["classnames"] == ["chair", "desk"]
    assert len(meta["train"]) == 4 and len(meta["test"]) == 4

    sample = meta["train"][0]
    arr = np.load(out / "train" / f"{sample['model']}.npy")
    assert arr.shape == (3, 8, 8, 3)
    assert arr.dtype == np.uint8

    # consumable by the dataset loader
    from greedy_multimodal_learning_tpu.data import MultiviewModelNet

    ds = MultiviewModelNet(str(out), "train", specific_view=[0, 2])
    idx, imgs, cls = ds[0]
    assert imgs.shape == (2, 8, 8, 3)
