#!/usr/bin/env python3
"""Summarize a 3-modality north-star suite (tools/run_northstar3d.py).

Reads <workdir>/northstar3d_summary.json and prints guided-vs-random
statistics for the N-modality analogue of the reference's claim
(reference README.md:12-23, generalized per BASELINE config 4): the
balancing controller should raise the conditional utilization rate of
BOTH weaker modalities (depth = modality 1, flow = modality 2 — the
graded-imbalance design of tools/make_imbalanced_nvgesture.py), measured
by the two-pass recording -> cross-modal-flow-off pipeline.

Statistics are the same assumption-free tests as the 2-view analyzer
(tools/analyze_northstar.py): exact / Monte-Carlo two-sided permutation
test on the difference of arm means plus the Mann-Whitney AUC.

Usage:  python3 tools/analyze_northstar3d.py SUMMARY.json
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from analyze_northstar import (  # noqa: E402
    ARMS,
    arm,
    arm_pairs,
    fmt,
    print_pairwise,
)


def main():
    with open(sys.argv[1]) as f:
        summary = json.load(f)
    arms = {name: arm(summary, name) for name in ARMS}
    arms = {name: runs for name, runs in arms.items() if runs}
    print("runs: " + ", ".join(f"{len(r)} {n}" for n, r in arms.items()) + "\n")

    comparisons = [
        ("flow-off depth (modality 1) test acc", "flowoff_test_acc_modal_1", "higher"),
        ("flow-off flow (modality 2) test acc", "flowoff_test_acc_modal_2", "higher"),
        ("flow-off mean weak-modality acc (1+2)/2", None, "higher"),
        ("epochs to CompletedStopping", "epochs_run", "lower"),
        ("test top-1 @ best val", "test_acc", "higher"),
        ("final train acc, flow (modality 2)", "final_train_acc_modal_2", "higher"),
    ]
    pairs = arm_pairs(arms)
    for label, key, better in comparisons:
        if key is None:
            getter = lambda r: (  # noqa: E731
                (r["flowoff_test_acc_modal_1"] + r["flowoff_test_acc_modal_2"]) / 2.0
                if "flowoff_test_acc_modal_1" in r and "flowoff_test_acc_modal_2" in r
                else None
            )
        else:
            getter = lambda r, k=key: r.get(k)  # noqa: E731
        vals = {
            name: [v for v in (getter(r) for r in runs.values()) if v is not None]
            for name, runs in arms.items()
        }
        if not any(vals.values()):
            continue
        print(f"## {label}  ({better} is better)")
        for name, v in vals.items():
            if v:
                print(f"  {name} ({len(v)}): {fmt(sorted(v))}   mean {np.mean(v):.4g}")
        print_pairwise(vals, pairs)
        print()

    print("## per-run table (markdown)")
    print(
        "| run | epochs | test top-1 | test m1/m2 @best-val (flow on) | "
        "flow-off m0 | flow-off m1 | flow-off m2 |"
    )
    print("|---|---:|---:|---:|---:|---:|---:|")
    for name, r in [(n, r) for runs in arms.values() for n, r in runs.items()]:
        print(
            f"| {name.replace('_s', ' s')} | {r['epochs_run']} | {r['test_acc']:g} | "
            f"{r['test_acc_modal_1']:g} / {r['test_acc_modal_2']:g} | "
            f"{r['flowoff_test_acc_modal_0']:g} | {r['flowoff_test_acc_modal_1']:g} | "
            f"{r['flowoff_test_acc_modal_2']:g} |"
        )


if __name__ == "__main__":
    main()
