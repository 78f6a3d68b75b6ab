#!/usr/bin/env python3
"""Render the 3-modality north-star comparison figure (BASELINE config 4).

Four panels from the committed 3D-family run-level evidence (RESULTS.md):
  A. conditional utilization of modality 1 (depth) — flow-off test acc
  B. conditional utilization of modality 2 (flow) — flow-off test acc
  C. epochs to CompletedStopping — dot strip per arm
  D. weak-modality (mean of m1, m2) train-accuracy trajectories

Reads <dir>/northstar3d_summary.json and <dir>/*_history.csv, the outputs
of tools/run_northstar3d.py.

Usage:
  python3 tools/plot_northstar3d.py results/northstar3d [-o out.png]
"""

import argparse
import glob
import json
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from plot_northstar import (  # noqa: E402
    ARM_COLORS,
    GRID,
    INK,
    INK2,
    SURFACE,
    dot_strip,
    style_axes,
)

ARMS = ("guided", "random", "weakest", "weakest80", "adaptive")  # fixed categorical order


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("results_dir", nargs="?", default="results/northstar3d")
    ap.add_argument("-o", "--out", default=None)
    args = ap.parse_args()
    out = args.out or os.path.join(args.results_dir, "northstar3d_figure.png")

    with open(os.path.join(args.results_dir, "northstar3d_summary.json")) as f:
        summary = {k: v for k, v in json.load(f).items() if "error" not in v}

    def arm_vals(key):
        return {
            arm: [v[key] for k, v in summary.items() if k.startswith(arm + "_s")]
            for arm in ARMS
        }

    present = [a for a in ARMS if any(k.startswith(a + "_s") for k in summary)]

    fig = plt.figure(figsize=(11, 7.2), facecolor=SURFACE)
    gs = fig.add_gridspec(
        2, 3, height_ratios=[1, 1.35], hspace=0.42, wspace=0.34,
        left=0.08, right=0.97, top=0.86, bottom=0.09,
    )
    counts = "/".join(
        str(sum(1 for k in summary if k.startswith(a + "_s"))) for a in present
    )
    fig.suptitle(
        f"3-modality (3D-CNN) curation criteria: {' vs '.join(present)} — "
        f"{counts} seeds,\n"
        "full train → record → cross-modal-flow-off pipeline",
        color=INK, fontsize=13, x=0.08, y=0.985, ha="left",
    )

    axA = fig.add_subplot(gs[0, 0])
    dot_strip(
        axA, arm_vals("flowoff_test_acc_modal_1"), "flowoff1",
        "depth (m1) flow-off test acc (%)",
    )
    axA.set_title("A  Utilization: depth (m1)", loc="left", color=INK, fontsize=11)

    axB = fig.add_subplot(gs[0, 1])
    dot_strip(
        axB, arm_vals("flowoff_test_acc_modal_2"), "flowoff2",
        "flow (m2) flow-off test acc (%)",
    )
    axB.set_title("B  Utilization: flow (m2)", loc="left", color=INK, fontsize=11)

    axC = fig.add_subplot(gs[0, 2])
    dot_strip(axC, arm_vals("epochs_run"), "epochs", "epochs to CompletedStopping")
    axC.set_title("C  Convergence (lower is faster)", loc="left", color=INK, fontsize=11)

    axD = fig.add_subplot(gs[1, :])
    style_axes(axD, xlabel="epoch", ylabel="mean weak-modality (m1, m2) train acc (%)")
    axD.grid(True, axis="y", color=GRID, linewidth=0.8)
    for csv in sorted(glob.glob(os.path.join(args.results_dir, "*_history.csv"))):
        arm = os.path.basename(csv).split("_s")[0]
        if arm not in ARM_COLORS:
            continue
        df = pd.read_csv(csv)
        weak = (df["acc_modal_1"] + df["acc_modal_2"]) / 2.0
        axD.plot(
            df["epoch"], weak,
            color=ARM_COLORS[arm],
            linewidth=1.6, alpha=0.45, solid_capstyle="round",
        )
    handles = [
        plt.Line2D([], [], color=ARM_COLORS[a], linewidth=2, label=a)
        for a in present
    ]
    leg = axD.legend(handles=handles, loc="lower right", frameon=False, fontsize=10)
    for t in leg.get_texts():
        t.set_color(INK2)
    axD.set_title(
        "D  Weak-modality training trajectories (one line per run)",
        loc="left", color=INK, fontsize=11,
    )

    fig.savefig(out, dpi=150, facecolor=SURFACE)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
