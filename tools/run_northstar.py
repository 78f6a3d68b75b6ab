#!/usr/bin/env python3
"""North-star run-level experiment driver (BASELINE.json accuracy targets).

Runs the paper's headline comparison — guided (configs/training_guided.gin)
vs random-curation (configs/training_random.gin) — to convergence on the
modality-imbalanced dataset (tools/make_imbalanced_modelnet.py), two seeds
each, through the verbatim CLI, then the full two-pass conditional-
utilization-rate pipeline (configs/recording.gin → configs/eval.gin) on
every trained run (reference workflow: README.md:12-23).

Produces <workdir>/northstar_summary.json with, per run: final/best
accuracies, per-modality accuracies, steps-to-90%-top-1, and the
cross-modal-flow-off (conditional utilization) per-modality accuracies.

Usage:  python3 tools/run_northstar.py WORKDIR  [--epochs 300]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from driver_common import run_phase, sh


def train_complete(run_dir, n_epochs):
    """history.csv exists at every epoch, so its existence alone does NOT
    mean training finished — an interrupted run would silently enter the
    statistics.  Complete = reached the epoch budget (n_epochs-1 executed,
    quirk #3) or CompletedStopping fired (>= 5 epochs at train acc 100,
    the shipped configs' patience)."""
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


def summarize_run(run_dir, steps_per_epoch):
    import pandas as pd

    df = pd.read_csv(os.path.join(run_dir, "history.csv"))
    best_i = int(df["val_acc"].idxmax())
    over90 = df.index[df["test_acc"] >= 90.0]
    out = {
        "epochs_run": int(df["epoch"].iloc[-1]),
        "best_val_epoch": int(df["epoch"].iloc[best_i]),
        "best_val_acc": float(df["val_acc"].iloc[best_i]),
        # checkpoint-selected metrics (reference selection: best val_acc)
        "test_acc": float(df["test_acc"].iloc[best_i]),
        "test_acc_modal_0": float(df["test_acc_modal_0"].iloc[best_i]),
        "test_acc_modal_1": float(df["test_acc_modal_1"].iloc[best_i]),
        "final_train_acc": float(df["acc"].iloc[-1]),
        "final_train_acc_modal_0": float(df["acc_modal_0"].iloc[-1]),
        "final_train_acc_modal_1": float(df["acc_modal_1"].iloc[-1]),
        "steps_to_90_top1": int(df["epoch"].iloc[over90[0]]) * steps_per_epoch if len(over90) else None,
        "mean_train_samples_per_sec": float(df["train_samples_per_sec"].iloc[1:].mean()),
    }
    return out


def read_mmtm_off(run_dir):
    import pandas as pd

    path = os.path.join(run_dir, "mmtm_off_eval", "eval_history_batch", "history.csv")
    df = pd.read_csv(path)
    row = df.iloc[-1]
    return {
        "flowoff_test_acc": float(row["test_acc"]),
        "flowoff_test_acc_modal_0": float(row["test_acc_modal_0"]),
        "flowoff_test_acc_modal_1": float(row["test_acc_modal_1"]),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--seeds", type=int, nargs="+", default=[777, 1234])
    ap.add_argument(
        "--arms",
        nargs="+",
        default=["guided", "random"],
        choices=["guided", "random", "weakest"],
        help="controller arms to run (weakest = Bias_Mitigation_Weakest, "
        "the framework extension — configs/training_weakest.gin)",
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

    # Subprocesses run with cwd=REPO: a relative workdir would split
    # artifacts between two trees (driver resolves against invoking cwd).
    args.workdir = os.path.abspath(args.workdir)
    data = os.path.join(args.workdir, "data")
    os.makedirs(args.workdir, exist_ok=True)
    if not os.path.exists(os.path.join(data, "metadata.json")):
        sh([sys.executable, "tools/make_imbalanced_modelnet.py", data], os.path.join(args.workdir, "datagen.log"))

    summary_path = os.path.join(args.workdir, "northstar_summary.json")
    summary = {}
    if os.path.exists(summary_path):  # merge across driver invocations
        with open(summary_path) as f:
            summary = json.load(f)
    arm_configs = {
        "guided": "configs/training_guided.gin",
        "random": "configs/training_random.gin",
        "weakest": "configs/training_weakest.gin",
    }
    for kind, config in ((k, arm_configs[k]) for k in args.arms):
        for seed in args.seeds:
            name = f"{kind}_s{seed}"
            run = os.path.join(args.workdir, name)
            log = os.path.join(args.workdir, f"{name}.log")
            bindings = (
                f"get_mvdcndata.root_dir='{data}'"
                f"#train.seed={seed}"
                f"#training_loop.n_epochs={args.epochs}"
                f"#training_loop.checkpoint_every={args.checkpoint_every}"
            )
            if not train_complete(run, args.epochs):
                if os.path.exists(os.path.join(run, "history.csv")):
                    # interrupted earlier invocation: finish it via the
                    # framework's exact-resume path instead of skipping
                    bindings += "#training_loop.resume=True"
                rc = run_phase("train", run, config, bindings, log, args.in_process)
                if rc != 0:
                    summary[name] = {"error": f"train rc={rc}"}
                    continue

            ckpt = os.path.join(run, "model_best_val.pt")
            rec_bindings = (
                f"eval_.pretrained_weights_path='{ckpt}'#get_mvdcndata.root_dir='{data}'"
            )
            if not os.path.exists(os.path.join(run, "eval_history_batch", "history.pickle")):
                run_phase("eval", run, "configs/recording.gin", rec_bindings, log, args.in_process)

            off_dir = os.path.join(run, "mmtm_off_eval")
            off_bindings = (
                f"MMTM_MVCNN.mmtm_rescale_eval_file_path='{os.path.join(run, 'eval_history_batch')}'"
                f"#MMTM_MVCNN.mmtm_rescale_training_file_path='{run}'"
                f"#eval_.pretrained_weights_path='{ckpt}'"
                f"#get_mvdcndata.root_dir='{data}'"
            )
            if not os.path.exists(os.path.join(off_dir, "eval_history_batch", "history.csv")):
                run_phase("eval", off_dir, "configs/eval.gin", off_bindings, log, args.in_process)

            import pandas as pd  # noqa: F401  (import check before summarize)

            # steps/epoch from the actual dataset: the shipped training
            # configs use batch 8 and a 20% val split (configs/training*.gin)
            with open(os.path.join(data, "metadata.json")) as f:
                n_train_total = len(json.load(f)["train"])
            # reference split: val = floor(0.2n), train = n - floor(0.2n)
            # (data/modelnet.py::reference_val_split) — not floor(0.8n)
            import numpy as np

            n_train_split = n_train_total - int(np.floor(0.2 * n_train_total))
            steps_per_epoch = -(-n_train_split // 8)
            try:
                summary[name] = summarize_run(run, steps_per_epoch)
                summary[name].update(read_mmtm_off(run))
            except Exception as e:  # summarize failures shouldn't kill the suite
                summary[name] = {"error": repr(e)}
            with open(summary_path, "w") as f:
                json.dump(summary, f, indent=2)
            print(json.dumps({name: summary[name]}, indent=2), flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
