#!/usr/bin/env python3
"""Render the north-star guided-vs-random comparison figure.

Three panels from the committed run-level evidence (RESULTS.md):
  A. conditional utilization of the weak modality (flow-off test acc,
     the reference's recording -> mmtm-off pipeline) — dot strip per arm
  B. epochs to CompletedStopping — dot strip per arm
  C. weak-modality train accuracy trajectories, one line per run

Usage:
  python3 tools/plot_northstar.py results/northstar [-o out.png]

Reads <dir>/northstar_summary.json and <dir>/*_history.csv.
"""

import argparse
import glob
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pandas as pd

# Reference data-viz palette (validated categorical slots 1-5, fixed
# order, never cycled) + chrome, light mode.  Fixed assignment:
# guided=slot 1, random=slot 2, weakest=slot 3, weakest80=slot 4,
# adaptive=slot 5.
C_GUIDED = "#2a78d6"  # series 1: blue
C_RANDOM = "#eb6834"  # series 2: orange
C_WEAKEST = "#1baf7a"  # series 3: aqua
C_WEAKEST80 = "#eda100"  # series 4: yellow
C_ADAPTIVE = "#9467bd"  # series 5: purple
ARM_COLORS = {
    "guided": C_GUIDED,
    "random": C_RANDOM,
    "weakest": C_WEAKEST,
    "weakest80": C_WEAKEST80,
    "adaptive": C_ADAPTIVE,
}
SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK2 = "#52514e"
MUTED = "#898781"
GRID = "#e1e0d9"
BASE = "#c3c2b7"


def style_axes(ax, xlabel="", ylabel=""):
    ax.set_facecolor(SURFACE)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    for side in ("left", "bottom"):
        ax.spines[side].set_color(BASE)
    ax.tick_params(colors=MUTED, labelsize=9)
    ax.grid(True, axis="x", color=GRID, linewidth=0.8)
    ax.set_axisbelow(True)
    if xlabel:
        ax.set_xlabel(xlabel, color=INK2, fontsize=10)
    if ylabel:
        ax.set_ylabel(ylabel, color=INK2, fontsize=10)


def dot_strip(ax, rows, key, xlabel):
    """rows: {arm_name: [...], ...}; horizontal dot strip with a mean tick
    per arm.  Dots stack vertically when they collide.  Arms are drawn
    bottom-up in reverse of their fixed categorical order
    (guided/random/weakest/weakest80), skipping arms absent from
    ``rows``."""
    style_axes(ax, xlabel=xlabel)
    ax.grid(False, axis="y")
    arms = [a for a in ("weakest80", "weakest", "random", "guided") if rows.get(a)]
    for yi, arm in enumerate(arms):
        color = ARM_COLORS[arm]
        vals = sorted(rows[arm])
        seen = {}
        for v in vals:
            b = round(v / 1.2)  # collision bucket
            k = seen.get(b, 0)
            seen[b] = k + 1
            ax.plot(
                v, yi + k * 0.13, "o", color=color, markersize=7,
                markeredgecolor=SURFACE, markeredgewidth=1.2, clip_on=False,
            )
        mean = sum(vals) / len(vals)
        ax.plot([mean, mean], [yi - 0.22, yi + 0.22], color=color, linewidth=2)
        ax.annotate(
            f"mean {mean:.1f}", (mean, yi - 0.28), ha="center", va="top",
            fontsize=8.5, color=INK2,
        )
    ax.set_yticks(list(range(len(arms))))
    ax.set_yticklabels(arms, color=INK, fontsize=10)
    ax.set_ylim(-0.75, len(arms) - 0.25)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("results_dir", nargs="?", default="results/northstar")
    ap.add_argument("-o", "--out", default=None)
    args = ap.parse_args()
    out = args.out or os.path.join(args.results_dir, "northstar_figure.png")

    with open(os.path.join(args.results_dir, "northstar_summary.json")) as f:
        summary = {k: v for k, v in json.load(f).items() if "error" not in v}

    def arm_vals(key):
        return {
            arm: [v[key] for k, v in summary.items() if k.startswith(arm + "_s")]
            for arm in ARM_COLORS
        }

    present = [a for a in ARM_COLORS if any(k.startswith(a + "_s") for k in summary)]
    counts = "/".join(str(sum(1 for k in summary if k.startswith(a + "_s"))) for a in present)

    fig = plt.figure(figsize=(11, 7.2), facecolor=SURFACE)
    gs = fig.add_gridspec(
        2, 2, height_ratios=[1, 1.35], hspace=0.42, wspace=0.28,
        left=0.09, right=0.97, top=0.90, bottom=0.09,
    )
    fig.suptitle(
        f"Curation criteria: {' vs '.join(present)} — {counts} seeds, full "
        "train → record → cross-modal-flow-off pipeline",
        color=INK, fontsize=13, x=0.09, ha="left",
    )

    axA = fig.add_subplot(gs[0, 0])
    dot_strip(
        axA, arm_vals("flowoff_test_acc_modal_1"), "flowoff",
        "weak-modality test accuracy with cross-modal flow cut (%)",
    )
    axA.set_title("A  Conditional utilization of the weak modality", loc="left", color=INK, fontsize=11)

    axB = fig.add_subplot(gs[0, 1])
    dot_strip(axB, arm_vals("epochs_run"), "epochs", "epochs to CompletedStopping")
    axB.set_title("B  Convergence (lower is faster)", loc="left", color=INK, fontsize=11)

    axC = fig.add_subplot(gs[1, :])
    style_axes(axC, xlabel="epoch", ylabel="weak-modality train accuracy (%)")
    axC.grid(True, axis="y", color=GRID, linewidth=0.8)
    for csv in sorted(glob.glob(os.path.join(args.results_dir, "*_history.csv"))):
        arm = os.path.basename(csv).split("_s")[0]
        if arm not in ARM_COLORS:
            continue
        df = pd.read_csv(csv)
        axC.plot(
            df["epoch"], df["acc_modal_1"],
            color=ARM_COLORS[arm],
            linewidth=1.6, alpha=0.45, solid_capstyle="round",
        )
    handles = [
        plt.Line2D([], [], color=ARM_COLORS[a], linewidth=2, label=a)
        for a in present
    ]
    leg = axC.legend(
        handles=handles, loc="lower right", frameon=False, fontsize=10,
    )
    for t in leg.get_texts():
        t.set_color(INK2)
    axC.set_title(
        "C  Weak-modality training trajectories (one line per run)",
        loc="left", color=INK, fontsize=11,
    )

    fig.savefig(out, dpi=150, facecolor=SURFACE)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
