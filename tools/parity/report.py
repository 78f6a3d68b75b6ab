#!/usr/bin/env python3
"""Render the PARITY_RUN.md tables from a run_parity.py workdir.

Reads parity_summary.json, cross_eval.json, and the per-run history.csv
files; prints the four markdown fragments (cross-eval table, endpoint
table, flow-off table, verdict summary) to stdout for pasting into
PARITY_RUN.md (or diffing against it).

Usage: report.py WORKDIR [--late-from 11]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _arm_seed(name):
    impl, rest = name.split("_", 1)
    arm, s = rest.rsplit("_s", 1)
    return impl, arm, int(s)


def cross_eval_table(workdir):
    path = os.path.join(workdir, "cross_eval.json")
    if not os.path.exists(path):
        return "*(cross_eval.json not present)*"
    with open(path) as f:
        ce = json.load(f)
    lines = [
        "| checkpoint (trained by) | by_ref test/m0/m1 | by_jax test/m0/m1 | Δ(jax−ref) |",
        "|---|---|---|---|",
    ]
    maxd = 0.0
    n = 0
    for name in sorted(ce):
        r = ce[name]
        if "by_ref" not in r:
            lines.append(f"| {name} | — | — | ERROR: {r.get('error')} |")
            continue
        br, bj, d = r["by_ref"], r["by_jax"], r["delta_jax_minus_ref"]
        fmt = lambda m: f"{m['test_acc']:.0f}/{m['test_acc_modal_0']:.0f}/{m['test_acc_modal_1']:.0f}"
        ds = "/".join(f"{d[k]:+.1f}" for k in ("test_acc", "test_acc_modal_0", "test_acc_modal_1"))
        lines.append(f"| {name} | {fmt(br)} | {fmt(bj)} | {ds} |")
        maxd = max(maxd, max(abs(v) for v in d.values()))
        n += 1
    lines.append(f"\nmax |Δ| over {n} checkpoints × 3 metrics: **{maxd:.1f}**")
    return "\n".join(lines)


def _stats(vals):
    v = np.asarray(vals, float)
    return f"{v.mean():.1f} ± {v.std(ddof=1) if len(v) > 1 else 0:.1f} (n={len(v)})"


def endpoint_table(workdir, summary, late_from):
    import pandas as pd

    arms = sorted({_arm_seed(k)[1] for k in summary})
    rows = [
        "| arm | metric | reference | rebuild | Δ(jax−ref) |",
        "|---|---|---|---|---|",
    ]
    for arm in arms:
        by = {"ref": {}, "jax": {}}
        late = {"ref": [], "jax": []}
        for name, r in summary.items():
            impl, a, seed = _arm_seed(name)
            if a != arm or "test_acc" not in r:
                continue
            by[impl][seed] = r["test_acc"]
            hist = os.path.join(workdir, name, "history.csv")
            if os.path.exists(hist):
                df = pd.read_csv(hist)
                late[impl].append(float(df[df.epoch >= late_from].test_acc.mean()))
        if not by["ref"] or not by["jax"]:
            continue
        for label, ref_v, jax_v in (
            ("test top-1 @ best-val epoch", list(by["ref"].values()), list(by["jax"].values())),
            (f"mean test top-1, epochs {late_from}+", late["ref"], late["jax"]),
        ):
            d = np.mean(jax_v) - np.mean(ref_v)
            rows.append(f"| {arm} | {label} | {_stats(ref_v)} | {_stats(jax_v)} | {d:+.1f} |")
    return "\n".join(rows)


def flowoff_table(summary):
    arms = sorted({_arm_seed(k)[1] for k in summary})
    rows = [
        "| arm | metric | reference | rebuild | Δ(jax−ref) |",
        "|---|---|---|---|---|",
    ]
    for arm in arms:
        for metric, label in (
            ("flowoff_test_acc", "flow-off test top-1"),
            ("flowoff_test_acc_modal_0", "flow-off modality 0 (strong)"),
            ("flowoff_test_acc_modal_1", "flow-off modality 1 (weak)"),
        ):
            vals = {"ref": [], "jax": []}
            for name, r in summary.items():
                impl, a, _ = _arm_seed(name)
                if a == arm and metric in r:
                    vals[impl].append(r[metric])
            if not vals["ref"] or not vals["jax"]:
                continue
            d = np.mean(vals["jax"]) - np.mean(vals["ref"])
            rows.append(
                f"| {arm} | {label} | {_stats(vals['ref'])} | {_stats(vals['jax'])} | {d:+.1f} |"
            )
    return "\n".join(rows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--late-from", type=int, default=11)
    args = ap.parse_args()
    workdir = os.path.abspath(args.workdir)
    with open(os.path.join(workdir, "parity_summary.json")) as f:
        summary = json.load(f)["runs"]

    print("<!-- CROSS_EVAL_TABLE -->\n")
    print(cross_eval_table(workdir))
    print("\n<!-- ENDPOINT_TABLE -->\n")
    print(endpoint_table(workdir, summary, args.late_from))
    print("\n<!-- FLOWOFF_TABLE -->\n")
    print(flowoff_table(summary))


if __name__ == "__main__":
    main()
