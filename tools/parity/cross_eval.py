#!/usr/bin/env python3
"""Cross-evaluation parity: identical weights through both implementations.

The endpoint comparison in run_parity.py confounds implementation behavior
with trajectory noise (independent RNG streams on a small dataset).  This
tool isolates implementation behavior: every trained checkpoint
(<workdir>/{ref,jax}_<arm>_s<seed>/model_best_val.pt) is evaluated on the
test split by BOTH implementations —

  by_jax: the rebuild's ``eval.py`` (jax, CPU)
  by_ref: the unmodified reference via run_reference.py

and the two results are compared per checkpoint.  With weights held fixed,
any by_jax − by_ref delta is implementation behavior (preprocessing, BN
inference stats, gate math, blend/acc) — the north-star ±0.5%% parity
clause measured without trajectory variance.  Checkpoint interop: the
rebuild loads original reference ``.pt`` state_dicts and writes
torch-layout state_dicts the reference can load (engine/checkpoint.py;
reference load semantics: src/training_loop.py:78-83).

Note the history-recorded test metrics at the best-val epoch are NOT the
right baseline: the reference threads the controller's live curation state
into its in-training eval passes (reference: src/framework.py:146-148), so
those rows are curation-state-dependent; post-hoc evals run curation-off.
Both implementations' post-hoc evals are like-for-like.

Usage: cross_eval.py WORKDIR            # a run_parity.py workdir
       [--runs ref_guided_s777 ...]     # default: every run with a ckpt
"""

from __future__ import annotations

import argparse
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, os.path.join(REPO, "tools"))
sys.path.insert(0, HERE)
from driver_common import sh  # noqa: E402
from run_parity import jax_env  # noqa: E402

METRICS = ("test_acc", "test_acc_modal_0", "test_acc_modal_1")


def eval_bindings(data, ckpt, nclasses=10):
    return (
        f"eval_.pretrained_weights_path='{ckpt}'"
        "#eval_.target_data_split='test'"
        f"#get_mvdcndata.root_dir='{data}'"
        "#get_mvdcndata.specific_views=[0, 1]"
        "#get_mvdcndata.num_workers=0"
        f"#MMTM_MVCNN.nclasses={nclasses}"
    )


def read_metrics(out_dir):
    import pandas as pd

    row = pd.read_csv(os.path.join(out_dir, "eval_history_batch", "history.csv")).iloc[-1]
    return {m: float(row[m]) for m in METRICS}


def eval_ckpt(evaluator, out, data, ckpt, log, jax_device="cpu", nclasses=10):
    """Run one implementation's test eval of a checkpoint; returns metrics."""
    if not os.path.exists(os.path.join(out, "eval_history_batch", "history.csv")):
        bindings = eval_bindings(data, ckpt, nclasses)
        if evaluator == "jax":
            rc = sh(
                [sys.executable, "eval.py", out, "configs/recording.gin", bindings],
                log, jax_env(jax_device),
            )
        else:
            rc = sh(
                [sys.executable, os.path.join(HERE, "run_reference.py"),
                 "eval", out, "configs/recording.gin", bindings],
                log,
            )
        if rc != 0:
            raise RuntimeError(f"{evaluator} eval rc={rc}")
    return read_metrics(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--runs", nargs="*", default=None)
    ap.add_argument("--jax-device", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--nclasses", type=int, default=10,
                    help="label-space size of the workdir's dataset")
    args = ap.parse_args()
    workdir = os.path.abspath(args.workdir)
    data = os.path.join(workdir, "data")

    runs = args.runs or sorted(
        name
        for name in os.listdir(workdir)
        if os.path.exists(os.path.join(workdir, name, "model_best_val.pt"))
        and (name.startswith("ref_") or name.startswith("jax_"))
    )

    out_path = os.path.join(workdir, "cross_eval.json")
    results = {}
    if os.path.exists(out_path):  # resumable across invocations
        with open(out_path) as f:
            results = json.load(f)

    for name in runs:
        if name in results and "error" not in results[name]:
            continue
        ckpt = os.path.join(workdir, name, "model_best_val.pt")
        base = os.path.join(workdir, "cross_eval", name)
        os.makedirs(os.path.dirname(base), exist_ok=True)
        try:
            by = {
                ev: eval_ckpt(ev, f"{base}_by_{ev}", data, ckpt,
                              f"{base}_by_{ev}.log", args.jax_device,
                              args.nclasses)
                for ev in ("ref", "jax")
            }
        except RuntimeError as e:
            results[name] = {"error": str(e)}
            with open(out_path, "w") as f:
                json.dump(results, f, indent=2)
            continue
        entry = {
            "trained_by": name.split("_", 1)[0],
            "by_ref": by["ref"],
            "by_jax": by["jax"],
            "delta_jax_minus_ref": {
                m: round(by["jax"][m] - by["ref"][m], 3) for m in METRICS
            },
        }
        results[name] = entry
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)
        print(json.dumps({name: entry["delta_jax_minus_ref"]}), flush=True)

    deltas = [
        abs(v)
        for r in results.values()
        if "delta_jax_minus_ref" in r
        for v in r["delta_jax_minus_ref"].values()
    ]
    if deltas:
        print(
            json.dumps(
                {"n_checkpoints": len([r for r in results.values() if "by_ref" in r]),
                 "max_abs_delta": max(deltas),
                 "mean_abs_delta": round(sum(deltas) / len(deltas), 3)}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
