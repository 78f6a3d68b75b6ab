#!/usr/bin/env python3
"""Matmul-precision A/B: is the parity suite's small negative endpoint
offset a TPU-lowering artifact rather than RNG noise?

Background (PARITY_RUN.md §2): at n=6/arm the rebuild's trained endpoints
sit a consistent −1.5..−2.7 points below the reference's across both arms
and both endpoint metrics (permutation p ≥ 0.15 — individually noise, but
four-for-four in one direction).  With weights held fixed the two
implementations agree to 0.0, so any real trajectory-level cause must be a
*training-dynamics* difference.  The one backend asymmetry the suite had
never controlled: the rebuild's "f32" runs use JAX's DEFAULT matmul
precision, which on TPU rounds matmul/conv inputs to bf16 on the MXU
(f32 accumulate), while the reference's CPU torch arm multiplies in true
f32.  (The reference itself has no such knob — stock torch f32 ops,
reference: src/model.py:53-60.)

This tool compares three endpoint distributions per arm:

  ref          — reference implementation, CPU f32 (committed suite)
  jax_default  — rebuild, TPU, default matmul precision (committed suite)
  jax_highest  — rebuild, TPU, JAX_DEFAULT_MATMUL_PRECISION=highest
                 (fresh runs from a --train-only run_parity.py workdir;
                 identical dataset bytes, seeds, and protocol)

on the same two endpoint metrics as PARITY_RUN §2 (test top-1 @ best-val
epoch; mean test top-1 over epochs 11+), with the suite's standard
two-sided permutation test (tools/analyze_northstar.py).  Reading:

  * offset present in jax_default-vs-ref AND absent in jax_highest-vs-ref
    → the MXU bf16-input rounding is the systematic cause; `highest` is
    the like-for-like parity setting.
  * offset equally present in both → precision exonerated; the offset is
    RNG-stream noise at this n (or something else entirely).

Usage: precision_ab.py PRECISION_WORKDIR [--committed results/parity]
       [--out results/parity/precision_ab.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
import pandas as pd

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, os.path.join(REPO, "tools"))
from analyze_northstar import mann_whitney_u, permutation_pvalue  # noqa: E402

LATE_FROM_EPOCH = 11  # PARITY_RUN §2's late-window definition


def late_window_mean(history_csv):
    df = pd.read_csv(history_csv)
    w = df[df["epoch"] >= LATE_FROM_EPOCH]["test_acc"]
    return float(w.mean()) if len(w) else None


def collect(arm, seeds, summary_runs, history_path_fn):
    """Per-seed endpoint metrics for one (population, arm)."""
    best, late = [], []
    for s in seeds:
        run = summary_runs.get(f"jax_{arm}_s{s}") or summary_runs.get(f"ref_{arm}_s{s}")
        hist = history_path_fn(arm, s)
        if run and "test_acc" in run:
            best.append(run["test_acc"])
        if hist and os.path.exists(hist):
            lw = late_window_mean(hist)
            if lw is not None:
                late.append(lw)
    return best, late


def stats(a, b):
    if not a or not b:
        return None
    p, exact = permutation_pvalue(a, b)
    u, auc = mann_whitney_u(a, b)
    return {
        "n": [len(a), len(b)],
        "mean": [round(float(np.mean(a)), 2), round(float(np.mean(b)), 2)],
        "std": [round(float(np.std(a)), 2), round(float(np.std(b)), 2)],
        "delta": round(float(np.mean(a) - np.mean(b)), 2),
        "perm_p": round(float(p), 4),
        "perm_exact": bool(exact),
        "auc": round(float(auc), 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("precision_workdir")
    ap.add_argument("--committed", default=os.path.join(REPO, "results", "parity"))
    ap.add_argument("--out", default=os.path.join(REPO, "results", "parity", "precision_ab.json"))
    ap.add_argument("--arms", nargs="+", default=["guided", "random"])
    args = ap.parse_args()

    with open(os.path.join(args.committed, "parity_summary.json")) as f:
        committed = json.load(f)["runs"]
    with open(os.path.join(args.precision_workdir, "parity_summary.json")) as f:
        precision = json.load(f)["runs"]

    seeds = sorted({int(k.rsplit("_s", 1)[1]) for k in precision})

    out = {"seeds": seeds, "late_from_epoch": LATE_FROM_EPOCH, "arms": {}}
    for arm in args.arms:
        ref_runs = {k: v for k, v in committed.items() if k.startswith(f"ref_{arm}_")}
        jd_runs = {k: v for k, v in committed.items() if k.startswith(f"jax_{arm}_")}
        jh_runs = {k: v for k, v in precision.items() if k.startswith(f"jax_{arm}_")}

        ref_b, ref_l = collect(
            arm, seeds, ref_runs,
            lambda a, s: os.path.join(args.committed, f"ref_{a}_s{s}_history.csv"))
        jd_b, jd_l = collect(
            arm, seeds, jd_runs,
            lambda a, s: os.path.join(args.committed, f"jax_{a}_s{s}_history.csv"))
        jh_b, jh_l = collect(
            arm, seeds, jh_runs,
            lambda a, s: os.path.join(args.precision_workdir, f"jax_{a}_s{s}", "history.csv"))

        out["arms"][arm] = {
            "best_val_test_acc": {
                "jax_default_vs_ref": stats(jd_b, ref_b),
                "jax_highest_vs_ref": stats(jh_b, ref_b),
                "jax_highest_vs_jax_default": stats(jh_b, jd_b),
            },
            "late_window_test_acc": {
                "jax_default_vs_ref": stats(jd_l, ref_l),
                "jax_highest_vs_ref": stats(jh_l, ref_l),
                "jax_highest_vs_jax_default": stats(jh_l, jd_l),
            },
        }

    # paired per-seed deltas: jax_highest − jax_default share the seed, the
    # dataset bytes, and therefore the ENTIRE RNG stream (shuffle order,
    # flip draws, controller draws — train.seed governs all three), so the
    # pair isolates matmul rounding + its chaotic amplification from every
    # RNG-stream effect the unpaired comparison confounds
    paired = {}
    for arm in args.arms:
        rows = []
        for s in seeds:
            d = committed.get(f"jax_{arm}_s{s}", {})
            h = precision.get(f"jax_{arm}_s{s}", {})
            if "test_acc" in d and "test_acc" in h:
                dl = late_window_mean(os.path.join(args.committed, f"jax_{arm}_s{s}_history.csv"))
                hl = late_window_mean(os.path.join(args.precision_workdir, f"jax_{arm}_s{s}", "history.csv"))
                rows.append({
                    "seed": s,
                    "best_val_test_acc": [h["test_acc"], d["test_acc"]],
                    "delta_best": round(h["test_acc"] - d["test_acc"], 2),
                    "delta_late": (round(hl - dl, 2) if dl is not None and hl is not None else None),
                })
        paired[arm] = rows
    out["paired_highest_minus_default"] = paired

    # pooled late-window comparison across arms (PARITY_RUN §2's 12-vs-12)
    pool = {"ref": [], "jd": [], "jh": []}
    for arm in args.arms:
        _, rl = collect(arm, seeds, {},
                        lambda a, s: os.path.join(args.committed, f"ref_{a}_s{s}_history.csv"))
        _, dl = collect(arm, seeds, {},
                        lambda a, s: os.path.join(args.committed, f"jax_{a}_s{s}_history.csv"))
        _, hl = collect(arm, seeds, {},
                        lambda a, s: os.path.join(args.precision_workdir, f"jax_{a}_s{s}", "history.csv"))
        pool["ref"] += rl
        pool["jd"] += dl
        pool["jh"] += hl
    out["pooled_late_window"] = {
        "jax_default_vs_ref": stats(pool["jd"], pool["ref"]),
        "jax_highest_vs_ref": stats(pool["jh"], pool["ref"]),
        "jax_highest_vs_jax_default": stats(pool["jh"], pool["jd"]),
    }

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
