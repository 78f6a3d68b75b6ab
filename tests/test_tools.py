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


def test_analyze_northstar_statistics(tmp_path):
    """Permutation test + U statistic sanity on the suite analyzer."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    try:
        import analyze_northstar as an
        from analyze_northstar import mann_whitney_u, permutation_pvalue
    finally:
        sys.path.pop(0)

    # fully separated groups of 4: the only assignment at least as extreme
    # as observed is the observed one (and its mirror) -> p = 2/C(8,4)
    a, b = [10.0, 11.0, 12.0, 13.0], [1.0, 2.0, 3.0, 4.0]
    p, exact = permutation_pvalue(a, b)
    assert exact and abs(p - 2 / 70) < 1e-12
    u, auc = mann_whitney_u(a, b)
    assert u == 16.0 and auc == 1.0

    # identical groups: every assignment ties the observed statistic -> p = 1
    p, exact = permutation_pvalue([5.0, 5.0], [5.0, 5.0])
    assert exact and p == 1.0

    # large groups fall back to Monte Carlo; identical distributions must
    # stay far from significance, separated ones at the estimator floor
    old = an._EXACT_LIMIT
    an._EXACT_LIMIT, an._MC_SAMPLES = 10, 2000
    try:
        p, exact = permutation_pvalue(list(range(8)), list(range(8)))
        assert not exact and p > 0.5
        p, exact = permutation_pvalue([100.0 + i for i in range(8)], [float(i) for i in range(8)])
        assert not exact and p < 0.01
    finally:
        an._EXACT_LIMIT, an._MC_SAMPLES = old, 400_000
    _, auc = mann_whitney_u([5.0, 5.0], [5.0, 5.0])
    assert auc == 0.5

    # CLI runs end-to-end on a miniature summary
    summary = {
        "guided_s1": {"epochs_run": 10, "best_val_epoch": 5, "best_val_acc": 100.0,
                      "test_acc": 99.0, "test_acc_modal_0": 99.0, "test_acc_modal_1": 50.0,
                      "final_train_acc": 100.0, "final_train_acc_modal_0": 100.0,
                      "final_train_acc_modal_1": 95.0, "steps_to_90_top1": 600,
                      "mean_train_samples_per_sec": 80.0, "flowoff_test_acc": 99.0,
                      "flowoff_test_acc_modal_0": 99.0, "flowoff_test_acc_modal_1": 30.0},
        "random_s1": {"epochs_run": 12, "best_val_epoch": 6, "best_val_acc": 100.0,
                      "test_acc": 99.5, "test_acc_modal_0": 99.5, "test_acc_modal_1": 90.0,
                      "final_train_acc": 100.0, "final_train_acc_modal_0": 100.0,
                      "final_train_acc_modal_1": 93.0, "steps_to_90_top1": 840,
                      "mean_train_samples_per_sec": 80.0, "flowoff_test_acc": 99.5,
                      "flowoff_test_acc_modal_0": 99.5, "flowoff_test_acc_modal_1": 15.0},
    }
    p = tmp_path / "summary.json"
    p.write_text(json.dumps(summary))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, "tools/analyze_northstar.py", str(p)],
                       cwd=repo, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert "flow-off weak-modality" in r.stdout
    assert "| guided s1 |" in r.stdout and "| random s1 |" in r.stdout


def test_analyze_and_plot_northstar3d(tmp_path):
    """3-modality suite analyzer + figure tool run end-to-end on a
    miniature northstar3d_summary.json (the outputs of
    tools/run_northstar3d.py)."""
    import pandas as pd

    def run3d(epochs, m1_off, m2_off):
        return {
            "epochs_run": epochs, "best_val_epoch": epochs - 1,
            "best_val_acc": 100.0, "test_acc": 99.0, "final_train_acc": 100.0,
            "test_acc_modal_0": 100.0, "final_train_acc_modal_0": 100.0,
            "test_acc_modal_1": 92.0, "final_train_acc_modal_1": 98.0,
            "test_acc_modal_2": 99.0, "final_train_acc_modal_2": 99.5,
            "flowoff_test_acc": 97.0, "flowoff_test_acc_modal_0": 100.0,
            "flowoff_test_acc_modal_1": m1_off, "flowoff_test_acc_modal_2": m2_off,
        }

    summary = {
        "guided_s1": run3d(20, 85.0, 18.0), "guided_s2": run3d(22, 80.0, 16.0),
        "random_s1": run3d(26, 50.0, 12.0), "random_s2": run3d(28, 55.0, 11.0),
        "random_s3": {"error": "train rc=1"},  # must be excluded, not crash
    }
    (tmp_path / "northstar3d_summary.json").write_text(json.dumps(summary))
    for name in ("guided_s1", "random_s1"):
        pd.DataFrame({
            "epoch": [1, 2, 3], "acc_modal_1": [40.0, 70.0, 95.0],
            "acc_modal_2": [10.0, 30.0, 60.0],
        }).to_csv(tmp_path / f"{name}_history.csv", index=False)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "tools/analyze_northstar3d.py", str(tmp_path / "northstar3d_summary.json")],
        cwd=repo, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert "runs: 2 guided, 2 random" in r.stdout
    assert "flow-off depth (modality 1)" in r.stdout
    assert "flow-off flow (modality 2)" in r.stdout
    assert "| guided s1 |" in r.stdout and "| random s2 |" in r.stdout

    r = subprocess.run(
        [sys.executable, "tools/plot_northstar3d.py", str(tmp_path), "-o", str(tmp_path / "fig.png")],
        cwd=repo, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "fig.png").stat().st_size > 10_000
