#!/usr/bin/env python3
"""Head-to-head parity experiment: the UNMODIFIED reference implementation
(CPU-shimmed, out-of-tree — run_reference.py) vs this rebuild, on an
IDENTICAL reduced-scale imbalanced dataset (make_dataset.py; files are
torch-serialized so both pipelines read the same bytes), through BOTH full
pipelines: train → recording eval (train split, best checkpoint) →
cross-modal-flow-off eval (test split).

Measures the BASELINE north-star parity clause: final top-1 (test accuracy
at the best-val epoch) within ±0.5 points between implementations, plus
flow-off (conditional utilization) accuracy deltas.

Per (arm, seed) four runs are produced:
  <workdir>/ref_<arm>_s<seed>   — reference implementation
  <workdir>/jax_<arm>_s<seed>   — rebuild
Summary lands in <workdir>/parity_summary.json; re-invocation resumes
(completed runs are skipped).

Usage: python3 tools/parity/run_parity.py WORKDIR [--epochs 21]
       [--seeds 777 778 779 780] [--arms guided random]
"""

from __future__ import annotations

import argparse
import fcntl
import json
import os
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, os.path.join(REPO, "tools"))
from driver_common import sh

NCLASSES = 10  # default; --nclasses overrides (northstar scale: 40)
IMAGE = 64


def jax_env(device="cpu"):
    """Environment for the rebuild's runs.

    cpu: pure-CPU, the reference's exact hardware class (JAX_PLATFORMS=cpu;
    PALLAS_AXON_POOL_IPS= stops sitecustomize force-registering the remote
    TPU backend).  tpu: the rebuild's native target — inherit the ambient
    env so the axon TPU registers; compute dtype stays the configs' f32
    default either way, so the arms differ only in backend lowering.
    """
    if device == "tpu":
        return {}
    return {"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": ""}


def common_bindings(data, seed, epochs, nclasses=NCLASSES):
    return (
        f"get_mvdcndata.root_dir='{data}'"
        f"#get_mvdcndata.specific_views=[0, 1]"
        f"#get_mvdcndata.num_workers=0"
        f"#get_mvdcndata.seed={seed}"
        f"#MMTM_MVCNN.nclasses={nclasses}"
        f"#training_loop.n_epochs={epochs}"
    )


def eval_bindings(data, run, which, nclasses=NCLASSES):
    ckpt = os.path.join(run, "model_best_val.pt")
    b = (
        f"eval_.pretrained_weights_path='{ckpt}'"
        f"#get_mvdcndata.root_dir='{data}'"
        f"#get_mvdcndata.specific_views=[0, 1]"
        f"#get_mvdcndata.num_workers=0"
        f"#MMTM_MVCNN.nclasses={nclasses}"
    )
    if which == "off":
        b += (
            f"#MMTM_MVCNN.mmtm_rescale_eval_file_path='{os.path.join(run, 'eval_history_batch')}'"
            f"#MMTM_MVCNN.mmtm_rescale_training_file_path='{run}'"
            f"#MMTM_MVCNN.device='cpu'"
        )
    return b


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
    # CompletedStopping (patience 5 at train acc == 100, shipped configs)
    return int((df["acc"] == 100.0).sum()) >= 5


def summarize_run(run_dir):
    import pandas as pd

    df = pd.read_csv(os.path.join(run_dir, "history.csv"))
    best_i = int(df["val_acc"].idxmax())
    out = {
        "epochs_run": int(df["epoch"].iloc[-1]),
        "best_val_epoch": int(df["epoch"].iloc[best_i]),
        "best_val_acc": float(df["val_acc"].iloc[best_i]),
        "test_acc": float(df["test_acc"].iloc[best_i]),
        "test_acc_modal_0": float(df["test_acc_modal_0"].iloc[best_i]),
        "test_acc_modal_1": float(df["test_acc_modal_1"].iloc[best_i]),
        "final_train_acc": float(df["acc"].iloc[-1]),
    }
    offcsv = os.path.join(run_dir, "mmtm_off_eval", "eval_history_batch", "history.csv")
    if os.path.exists(offcsv):
        row = pd.read_csv(offcsv).iloc[-1]
        out.update(
            flowoff_test_acc=float(row["test_acc"]),
            flowoff_test_acc_modal_0=float(row["test_acc_modal_0"]),
            flowoff_test_acc_modal_1=float(row["test_acc_modal_1"]),
        )
    return out


def run_one(impl, arm, seed, workdir, data, epochs, jax_device="cpu", nclasses=NCLASSES,
            train_only=False):
    """Train + recording + flow-off for one (implementation, arm, seed)."""
    name = f"{impl}_{arm}_s{seed}"
    run = os.path.join(workdir, name)
    log = os.path.join(workdir, f"{name}.log")
    config = f"configs/training_{arm}.gin"

    if impl == "ref":
        runner = [sys.executable, os.path.join(HERE, "run_reference.py")]
        env = {"PARITY_TORCH_SEED": str(seed)}
        train_cmd = runner + ["train", run, config, common_bindings(data, seed, epochs, nclasses)]
        rec_cmd = runner + ["eval", run, "configs/recording.gin", eval_bindings(data, run, "rec", nclasses)]
        off_cmd = runner + [
            "eval", os.path.join(run, "mmtm_off_eval"), "configs/eval.gin",
            eval_bindings(data, run, "off", nclasses),
        ]
    else:
        env = jax_env(jax_device)
        train_cmd = [
            sys.executable, "train.py", run, config,
            common_bindings(data, seed, epochs, nclasses) + f"#train.seed={seed}",
        ]
        rec_cmd = [sys.executable, "eval.py", run, "configs/recording.gin", eval_bindings(data, run, "rec", nclasses)]
        off_cmd = [
            sys.executable, "eval.py", os.path.join(run, "mmtm_off_eval"), "configs/eval.gin",
            eval_bindings(data, run, "off", nclasses),
        ]

    if not train_complete(run, epochs):
        rc = sh(train_cmd, log, env)
        if rc != 0:
            return {"error": f"train rc={rc}"}
    if train_only:
        # endpoint-only experiments (e.g. the matmul-precision A/B) skip the
        # recording/flow-off phases; summarize_run tolerates their absence
        try:
            return summarize_run(run)
        except Exception as e:
            return {"error": repr(e)}
    if not os.path.exists(os.path.join(run, "eval_history_batch", "history.pickle")):
        rc = sh(rec_cmd, log, env)
        if rc != 0:
            return {"error": f"recording rc={rc}"}
    if not os.path.exists(os.path.join(run, "mmtm_off_eval", "eval_history_batch", "history.csv")):
        rc = sh(off_cmd, log, env)
        if rc != 0:
            return {"error": f"off-eval rc={rc}"}
    try:
        return summarize_run(run)
    except Exception as e:
        return {"error": repr(e)}


def aggregate(summary, arms, seeds):
    """Per-arm per-implementation means and the ref-vs-rebuild deltas."""
    import numpy as np

    table = {}
    for arm in arms:
        table[arm] = {}
        for metric in ("test_acc", "test_acc_modal_0", "test_acc_modal_1",
                       "flowoff_test_acc", "flowoff_test_acc_modal_0",
                       "flowoff_test_acc_modal_1", "best_val_acc"):
            vals = {}
            for impl in ("ref", "jax"):
                xs = [
                    summary[f"{impl}_{arm}_s{s}"][metric]
                    for s in seeds
                    if metric in summary.get(f"{impl}_{arm}_s{s}", {})
                ]
                if xs:
                    vals[impl] = {"mean": float(np.mean(xs)), "std": float(np.std(xs)), "n": len(xs)}
            if "ref" in vals and "jax" in vals:
                vals["delta_jax_minus_ref"] = round(vals["jax"]["mean"] - vals["ref"]["mean"], 3)
            table[arm][metric] = vals
    return table


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--epochs", type=int, default=21)
    ap.add_argument("--seeds", type=int, nargs="+", default=[777, 778, 779, 780])
    ap.add_argument("--arms", nargs="+", default=["guided", "random"], choices=["guided", "random"])
    ap.add_argument("--impls", nargs="+", default=["ref", "jax"], choices=["ref", "jax"])
    ap.add_argument("--nclasses", type=int, default=NCLASSES,
                    help="label-space size; also passed to dataset generation "
                    "for a fresh workdir (northstar scale: 40)")
    ap.add_argument("--image-size", type=int, default=IMAGE,
                    help="image side for dataset generation of a fresh "
                    "workdir (northstar scale: 112)")
    ap.add_argument(
        "--jax-device",
        default="cpu",
        choices=["cpu", "tpu"],
        help="backend for the rebuild's runs: cpu (reference's hardware "
        "class, like-for-like) or tpu (the rebuild's native target; "
        "single-tenant tunnel — don't share the chip with another job)",
    )
    ap.add_argument("--train-only", action="store_true",
                    help="skip the recording/flow-off phases (endpoint-only "
                    "experiments, e.g. the matmul-precision A/B)")
    args = ap.parse_args()

    workdir = os.path.abspath(args.workdir)
    os.makedirs(workdir, exist_ok=True)
    data = os.path.join(workdir, "data")
    if not os.path.exists(os.path.join(data, "metadata.json")):
        rc = sh([sys.executable, os.path.join(HERE, "make_dataset.py"), data,
                 "--classes", str(args.nclasses), "--image-size", str(args.image_size)],
                os.path.join(workdir, "datagen.log"))
        assert rc == 0, "dataset generation failed"

    summary_path = os.path.join(workdir, "parity_summary.json")
    summary = {}
    if os.path.exists(summary_path):
        with open(summary_path) as f:
            summary = json.load(f).get("runs", {})

    ran = {}  # the runs THIS invocation executed (authoritative on write)
    for arm in args.arms:
        for seed in args.seeds:
            for impl in args.impls:
                name = f"{impl}_{arm}_s{seed}"
                if name in summary and "error" not in summary[name]:
                    continue
                ran[name] = summary[name] = run_one(
                    impl, arm, seed, workdir, data, args.epochs, args.jax_device,
                    args.nclasses, args.train_only,
                )
                # Merge-and-write under an exclusive flock, with an atomic
                # rename: concurrent invocations (e.g. --impls ref and
                # --impls jax drivers running side by side) may complete
                # runs between this process's read and write, and a reader
                # must never see a half-written summary.  Only the runs
                # this invocation actually executed override disk state.
                lock_path = summary_path + ".lock"
                with open(lock_path, "w") as lock:
                    fcntl.flock(lock, fcntl.LOCK_EX)
                    if os.path.exists(summary_path):
                        with open(summary_path) as f:
                            on_disk = json.load(f).get("runs", {})
                        on_disk.update(ran)
                        summary = on_disk
                    # aggregate over every (arm, seed) present in the
                    # merged runs, not just this invocation's — sequential
                    # invocations (e.g. per-arm) must not clobber each
                    # other's aggregates
                    all_arms = sorted({k.split("_", 1)[1].rsplit("_s", 1)[0] for k in summary})
                    all_seeds = sorted({int(k.rsplit("_s", 1)[1]) for k in summary})
                    out = {
                        "runs": summary,
                        "aggregate": aggregate(summary, all_arms, all_seeds),
                        "config": {"epochs": args.epochs, "seeds": args.seeds,
                                   "nclasses": args.nclasses,
                                   "image": args.image_size},
                    }
                    fd, tmp = tempfile.mkstemp(dir=workdir, suffix=".summary.tmp")
                    with os.fdopen(fd, "w") as f:
                        json.dump(out, f, indent=2)
                    os.replace(tmp, summary_path)
                print(json.dumps({name: summary[name]}), flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
