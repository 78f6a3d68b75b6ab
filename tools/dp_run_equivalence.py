#!/usr/bin/env python3
"""Run-level data-parallel equivalence: a full small-scale guided training
run on the virtual 8-device CPU mesh (training_dp_v5e8.gin mechanics) vs
the IDENTICAL run single-device.

tests/test_parallel.py pins sharded step == single-device step, but the
guided controller integrates BDR statistics across the whole run, so
step-level equality does not automatically pin run-level behavior under
data-parallel reduction orders.  This driver runs both configurations on
the same synthetic dataset, same seed, same hyperparameters (batch kept at
the same GLOBAL size so the semantics are identical — GSPMD only changes
layout), then compares:

  * history.csv trajectories (loss / acc / val_acc / test_acc per epoch),
  * the run-integrated controller state from the exact-resume sidecar
    (M_main / M_bypass accumulate over every step of the run; d_BDR,
    curation flags at the end),
  * best-val epoch selection and its accuracy.

GSPMD semantics are global, so the two runs execute the same math with
different reduction orders; agreement to float-noise tolerance is the
strongest run-level multi-chip check a single-chip environment allows
(the reference has no distributed capability at all —
src/training_loop.py:91,130-133).

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python tools/dp_run_equivalence.py WORKDIR [--epochs 12]
(the driver sets those env vars for its subprocesses itself)
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from driver_common import sh

ENV = {
    "JAX_PLATFORMS": "cpu",
    "PALLAS_AXON_POOL_IPS": "",
    "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
}


def run_arm(name, workdir, data, dp, epochs, seed):
    run = os.path.join(workdir, name)
    if os.path.exists(os.path.join(run, "history.csv")):
        return run
    bindings = (
        f"get_mvdcndata.root_dir='{data}'"
        f"#get_mvdcndata.specific_views=[0, 1]"
        f"#get_mvdcndata.num_workers=0"
        f"#get_mvdcndata.seed={seed}"
        f"#MMTM_MVCNN.nclasses=6"
        f"#train.batch_size=8"
        f"#train.seed={seed}"
        f"#training_loop.n_epochs={epochs + 1}"
        + ("#training_loop.data_parallel=True" if dp else "")
    )
    rc = sh(
        [sys.executable, "train.py", run, "configs/training_guided.gin", bindings],
        os.path.join(workdir, f"{name}.log"),
        ENV,
    )
    assert rc == 0, f"{name} failed rc={rc}"
    return run


def sidecar_controller(run):
    with open(os.path.join(run, "model_last_epoch.pt.jax.pkl"), "rb") as f:
        return pickle.load(f)["controller"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    workdir = os.path.abspath(args.workdir)
    os.makedirs(workdir, exist_ok=True)

    data = os.path.join(workdir, "data")
    if not os.path.exists(os.path.join(data, "metadata.json")):
        rc = sh(
            [sys.executable, "-c",
             "import sys; sys.path.insert(0, '.');"
             "from greedy_multimodal_learning_tpu.data.synthetic import make_synthetic_modelnet;"
             f"make_synthetic_modelnet('{data}', n_train=48, n_test=16, num_views=2, image_size=32, nclasses=6)"],
            os.path.join(workdir, "datagen.log"), ENV,
        )
        assert rc == 0

    single = run_arm("single", workdir, data, dp=False, epochs=args.epochs, seed=args.seed)
    dp = run_arm("dp8", workdir, data, dp=True, epochs=args.epochs, seed=args.seed)

    import pandas as pd

    h1, h2 = pd.read_csv(os.path.join(single, "history.csv")), pd.read_csv(os.path.join(dp, "history.csv"))
    n = min(len(h1), len(h2))
    report = {"epochs_single": len(h1), "epochs_dp": len(h2), "metrics": {}}
    for m in ("loss", "acc", "val_acc", "test_acc", "acc_modal_0", "acc_modal_1"):
        d = np.abs(h1[m].values[:n] - h2[m].values[:n])
        report["metrics"][m] = {
            "max_abs_delta": float(d.max()),
            "mean_abs_delta": float(d.mean()),
            "first_epoch_delta": float(d[0]),
        }
    b1, b2 = int(h1["val_acc"].idxmax()), int(h2["val_acc"].idxmax())
    report["best_val"] = {
        "single": {"epoch": int(h1["epoch"][b1]), "val_acc": float(h1["val_acc"][b1]), "test_acc": float(h1["test_acc"][b1])},
        "dp8": {"epoch": int(h2["epoch"][b2]), "val_acc": float(h2["val_acc"][b2]), "test_acc": float(h2["test_acc"][b2])},
    }

    # Decisive semantic check: both runs must consume identical batches in
    # identical order (shuffle, split, and pipeline behavior must not
    # depend on the mesh) — with that pinned, any metric drift is
    # reduction-order float noise compounding through training, the same
    # class test_parallel.py bounds at step level.
    with open(os.path.join(single, "history.pickle"), "rb") as f:
        p1 = pickle.load(f)
    with open(os.path.join(dp, "history.pickle"), "rb") as f:
        p2 = pickle.load(f)
    same_order = all(
        np.array_equal(np.asarray(a).ravel(), np.asarray(b).ravel())
        for a, b in zip(p1["train_indices"], p2["train_indices"])
    )
    report["identical_sample_order_all_epochs"] = bool(same_order)

    c1, c2 = sidecar_controller(single), sidecar_controller(dp)
    ctrl = {}
    for k in ("M_main", "M_bypass"):
        a, b = np.asarray(c1[k], np.float64), np.asarray(c2[k], np.float64)
        ctrl[k] = {
            "single": a.tolist(), "dp8": b.tolist(),
            "max_rel_delta": float(np.max(np.abs(a - b) / np.maximum(np.abs(a), 1e-30))),
        }
    ctrl["d_BDR"] = {"single": float(c1["d_BDR"]), "dp8": float(c2["d_BDR"]),
                     "abs_delta": float(abs(c1["d_BDR"] - c2["d_BDR"]))}
    ctrl["final_curation"] = {
        "single": [bool(c1["curation_mode"]), int(c1["caring_modality"]), int(c1["curation_step"])],
        "dp8": [bool(c2["curation_mode"]), int(c2["caring_modality"]), int(c2["curation_step"])],
    }
    report["controller"] = ctrl

    out = args.json or os.path.join(workdir, "dp_equivalence.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))

    # Verdict.  Run-level bitwise equality is not the expectation — the
    # lr-0.1 early regime is chaotic (epoch-1 val losses in the hundreds),
    # so reduction-order noise compounds into visible continuous-metric
    # drift while the DISCRETE trajectory stays pinned.  Asserted
    # invariants: identical data order every epoch (semantics), identical
    # first-epoch accuracies (train/val/test and per-modality — the
    # forward/backward agree before drift accumulates), same stopping
    # epoch, and the same selected best-val checkpoint (same epoch, or
    # equal val_acc when two epochs tie).
    assert report["identical_sample_order_all_epochs"], "sample order diverged under dp"
    for m in ("acc", "val_acc", "test_acc", "acc_modal_0", "acc_modal_1"):
        assert report["metrics"][m]["first_epoch_delta"] == 0.0, f"first-epoch {m} diverged"
    assert report["epochs_single"] == report["epochs_dp"], "run lengths differ (stopping diverged)"
    bv = report["best_val"]
    assert (
        bv["single"]["epoch"] == bv["dp8"]["epoch"]
        or abs(bv["single"]["val_acc"] - bv["dp8"]["val_acc"]) < 1e-9
    ), "best-val checkpoint selection diverged"
    print("DP run-level equivalence: OK", flush=True)


if __name__ == "__main__":
    main()
