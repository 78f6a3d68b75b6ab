#!/usr/bin/env python3
"""3-modality (3D-CNN family) run-level experiment driver.

The N-modality analogue of tools/run_northstar.py (BASELINE config 4):
guided (configs/training_3dcnn_guided.gin) vs random-curation
(configs/training_3dcnn_random.gin) on the graded-imbalance synthetic
clip dataset (tools/make_imbalanced_nvgesture.py), then the two-pass
conditional-utilization pipeline (configs/recording_3dcnn.gin →
configs/eval_3dcnn.gin) on every trained run.

Produces <workdir>/northstar3d_summary.json with, per run: epochs, test
top-1, per-modality accuracies, and the cross-modal-flow-off per-modality
accuracies for all three modalities.

Usage:  python3 tools/run_northstar3d.py WORKDIR --seeds 7 42
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from driver_common import run_phase, sh

# Small-but-real scale: 10 classes, 400/150 clips, 8 frames @32^2,
# width 0.5 — minutes per arm on one chip, still imbalanced enough that
# greedy learning visibly favors modality 0.
DATA_ARGS = ["--n-train", "400", "--n-test", "150", "--size", "32", "--frames", "8", "--nclasses", "10"]
WIDTH = 0.5
EPOCHS_DEFAULT = 60


def train_complete(run_dir, n_epochs):
    hist = os.path.join(run_dir, "history.csv")
    if not os.path.exists(hist):
        return False
    import pandas as pd

    df = pd.read_csv(hist)
    if len(df) == 0:
        return False
    if int(df["epoch"].iloc[-1]) >= n_epochs - 1:
        return True
    return int((df["acc"] == 100.0).sum()) >= 5


def summarize_run(run_dir):
    import pandas as pd

    df = pd.read_csv(os.path.join(run_dir, "history.csv"))
    best = df.loc[df["val_acc"].idxmax()]
    out = {
        "epochs_run": int(df["epoch"].iloc[-1]),
        "best_val_epoch": int(best["epoch"]),
        "best_val_acc": float(best["val_acc"]),
        "test_acc": float(best["test_acc"]),
        "final_train_acc": float(df["acc"].iloc[-1]),
    }
    for m in range(3):
        out[f"test_acc_modal_{m}"] = float(best[f"test_acc_modal_{m}"])
        out[f"final_train_acc_modal_{m}"] = float(df[f"acc_modal_{m}"].iloc[-1])
    # Which modality was weakest on val at each epoch end (the target the
    # weakest controller designates; mechanism telemetry for every arm).
    vals = df[[f"val_acc_modal_{m}" for m in range(3)]].values
    am = vals.argmin(axis=1)
    out["val_weakest_counts"] = [int((am == m).sum()) for m in range(3)]
    return out


def read_mmtm_off(run_dir):
    import pandas as pd

    csv = os.path.join(run_dir, "mmtm_off_eval", "eval_history_batch", "history.csv")
    row = pd.read_csv(csv).iloc[-1]
    out = {"flowoff_test_acc": float(row["test_acc"])}
    for m in range(3):
        out[f"flowoff_test_acc_modal_{m}"] = float(row[f"test_acc_modal_{m}"])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--epochs", type=int, default=EPOCHS_DEFAULT)
    ap.add_argument("--seeds", type=int, nargs="+", default=[7, 42])
    ap.add_argument(
        "--arms",
        nargs="+",
        default=["guided", "random"],
        choices=["guided", "random", "weakest", "weakest80", "adaptive"],
        help="which controller arms to run (weakest = Bias_Mitigation_Weakest, "
        "the N-modality extension — see configs/training_3dcnn_weakest.gin; "
        "weakest80 = the same controller at an 8-of-10-step duty cycle, the "
        "curation-intensity follow-up RESULTS.md's 18-seed analysis calls for; "
        "adaptive = Bias_Mitigation_AdaptiveWeakest, weakest targeting gated "
        "on the val-accuracy gap with guided's window semantics — "
        "configs/training_3dcnn_adaptive.gin, RESULTS.md Finding 4)",
    )
    ap.add_argument("--checkpoint-every", type=int, default=50)
    ap.add_argument(
        "--in-process",
        action="store_true",
        help="drive phases via run_api.run_entry in this process (warm jit "
        "caches + device corpus across the suite) instead of one "
        "subprocess per phase; see tools/driver_common.py",
    )
    args = ap.parse_args()

    args.workdir = os.path.abspath(args.workdir)
    data = os.path.join(args.workdir, "data")
    os.makedirs(args.workdir, exist_ok=True)
    if not os.path.exists(os.path.join(data, "metadata.json")):
        sh(
            [sys.executable, "tools/make_imbalanced_nvgesture.py", data] + DATA_ARGS,
            os.path.join(args.workdir, "datagen.log"),
        )

    summary_path = os.path.join(args.workdir, "northstar3d_summary.json")
    summary = {}
    if os.path.exists(summary_path):  # merge across driver invocations
        with open(summary_path) as f:
            summary = json.load(f)

    common = (
        f"get_nvgesturedata.root_dir='{data}'"
        f"#MMTM_3DCNN.nclasses=10"
        f"#MMTM_3DCNN.width_multiplier={WIDTH}"
    )
    arm_configs = {
        "guided": "configs/training_3dcnn_guided.gin",
        "random": "configs/training_3dcnn_random.gin",
        "weakest": "configs/training_3dcnn_weakest.gin",
        "weakest80": "configs/training_3dcnn_weakest.gin",
        "adaptive": "configs/training_3dcnn_adaptive.gin",
    }
    arm_bindings = {
        "weakest80": "#Bias_Mitigation_Weakest.curation_windowsize=8",
    }
    for kind, config in ((k, arm_configs[k]) for k in args.arms):
        for seed in args.seeds:
            name = f"{kind}_s{seed}"
            run = os.path.join(args.workdir, name)
            log = os.path.join(args.workdir, f"{name}.log")
            bindings = (
                common
                + arm_bindings.get(kind, "")
                + f"#train.seed={seed}"
                + f"#training_loop.n_epochs={args.epochs}"
                + f"#training_loop.checkpoint_every={args.checkpoint_every}"
            )
            if not train_complete(run, args.epochs):
                if os.path.exists(os.path.join(run, "history.csv")):
                    bindings += "#training_loop.resume=True"
                rc = run_phase("train", run, config, bindings, log, args.in_process)
                if rc != 0:
                    summary[name] = {"error": f"train rc={rc}"}
                    continue

            ckpt = os.path.join(run, "model_best_val.pt")
            rec_bindings = common + f"#eval_.pretrained_weights_path='{ckpt}'"
            if not os.path.exists(os.path.join(run, "eval_history_batch", "history.pickle")):
                run_phase("eval", run, "configs/recording_3dcnn.gin", rec_bindings, log, args.in_process)

            off_dir = os.path.join(run, "mmtm_off_eval")
            off_bindings = (
                common
                + f"#MMTM_3DCNN.mmtm_rescale_eval_file_path='{os.path.join(run, 'eval_history_batch')}'"
                + f"#MMTM_3DCNN.mmtm_rescale_training_file_path='{run}'"
                + f"#eval_.pretrained_weights_path='{ckpt}'"
            )
            if not os.path.exists(os.path.join(off_dir, "eval_history_batch", "history.csv")):
                run_phase("eval", off_dir, "configs/eval_3dcnn.gin", off_bindings, log, args.in_process)

            try:
                summary[name] = summarize_run(run)
                summary[name].update(read_mmtm_off(run))
            except Exception as e:
                summary[name] = {"error": repr(e)}
            with open(summary_path, "w") as f:
                json.dump(summary, f, indent=2)
            print(json.dumps({name: summary[name]}, indent=2), flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
