#!/usr/bin/env python3
"""Summarize a north-star suite (tools/run_northstar.py) with statistics.

Reads <workdir>/northstar_summary.json (any number of seeds per arm) and
prints the RESULTS.md evidence tables plus significance tests for the two
headline comparisons from the reference's claim (README.md:12-23):

  * conditional utilization rate of the weak modality (flow-off test
    accuracy of modality 1) — guided vs random,
  * steps-to-90%-top-1 — guided vs random.

Significance is an exact two-sided permutation test on the difference of
arm means (all C(n0+n1, n0) label assignments when feasible), which is
assumption-free at these sample sizes; the rank-based Mann-Whitney U is
reported alongside.

Usage:  python3 tools/analyze_northstar.py SUMMARY.json
"""

from __future__ import annotations

import itertools
import json
import sys

import numpy as np


_EXACT_LIMIT = 4_000_000  # C(24,12) = 2.7M is fine; C(32,16) = 601M is not
_MC_SAMPLES = 400_000


def permutation_pvalue(a, b, rng_seed=0):
    """Two-sided permutation test on |mean(a) - mean(b)|.

    Exact (all C(n0+n1, n0) assignments) when that count is feasible;
    otherwise Monte Carlo over label shuffles with the add-one estimator
    (count+1)/(total+1), which is a valid p-value for sampled tests
    (Phipson & Smyth 2010).  Returns (p, exact_flag)."""
    a, b = np.asarray(a, float), np.asarray(b, float)
    pooled = np.concatenate([a, b])
    observed = abs(a.mean() - b.mean())
    n = len(a)
    from math import comb

    if comb(len(pooled), n) <= _EXACT_LIMIT:
        count = total = 0
        for idx in itertools.combinations(range(len(pooled)), n):
            mask = np.zeros(len(pooled), bool)
            mask[list(idx)] = True
            stat = abs(pooled[mask].mean() - pooled[~mask].mean())
            count += stat >= observed - 1e-12
            total += 1
        return count / total, True

    rng = np.random.default_rng(rng_seed)
    count = 0
    for _ in range(_MC_SAMPLES):
        perm = rng.permutation(pooled)
        stat = abs(perm[:n].mean() - perm[n:].mean())
        count += stat >= observed - 1e-12
    return (count + 1) / (_MC_SAMPLES + 1), False


def mann_whitney_u(a, b):
    """U statistic for 'a > b' with midranks; returns (U, AUC)."""
    a, b = np.asarray(a, float), np.asarray(b, float)
    u = sum(float((x > b).sum()) + 0.5 * float((x == b).sum()) for x in a)
    return u, u / (len(a) * len(b))


def arm(summary, kind):
    runs = {k: v for k, v in sorted(summary.items()) if k.startswith(kind + "_s") and "error" not in v}
    return runs


def fmt(vals, nd=4):
    return ", ".join(f"{v:.{nd}g}" if isinstance(v, float) else str(v) for v in vals)


ARMS = ("guided", "random", "weakest", "weakest80", "adaptive")


def arm_pairs(arms):
    """Ordered pairwise comparisons among the arms present."""
    return [
        (a, b)
        for i, a in enumerate(ARMS)
        for b in ARMS[i + 1 :]
        if a in arms and b in arms
    ]


def print_pairwise(vals, pairs):
    """Shared per-pair stat lines: permutation p + Mann-Whitney U/AUC."""
    for a, b in pairs:
        g, r = vals.get(a), vals.get(b)
        if not g or not r:
            continue
        p, exact = permutation_pvalue(g, r)
        u, auc = mann_whitney_u(g, r)
        kind = "exact" if exact else f"Monte Carlo ({_MC_SAMPLES:,} shuffles)"
        print(
            f"  {a} vs {b}: mean diff {np.mean(g) - np.mean(r):+.4g}; "
            f"{kind} permutation p = {p:.4g}; Mann-Whitney U = {u:.1f} (AUC {auc:.3f})"
        )


def main():
    with open(sys.argv[1]) as f:
        summary = json.load(f)
    arms = {name: arm(summary, name) for name in ARMS}
    arms = {name: runs for name, runs in arms.items() if runs}
    print("runs: " + ", ".join(f"{len(r)} {n}" for n, r in arms.items()) + "\n")
    pairs = arm_pairs(arms)

    for label, key, better in (
        ("flow-off weak-modality test acc (conditional utilization)", "flowoff_test_acc_modal_1", "higher"),
        ("steps to 90% top-1", "steps_to_90_top1", "lower"),
        ("epochs to CompletedStopping", "epochs_run", "lower"),
        ("test top-1 @ best val", "test_acc", "higher"),
    ):
        vals = {
            name: [r[key] for r in runs.values() if r.get(key) is not None]
            for name, runs in arms.items()
        }
        if not any(vals.values()):
            continue
        dropped = {name: len(arms[name]) - len(vals[name]) for name in arms}
        if any(dropped.values()):
            # e.g. runs that never reached 90% top-1: excluding them keeps
            # only the arm's best survivors, which biases the comparison —
            # the test below is over survivors ONLY and must say so.
            print(
                f"## {label}: WARNING — excluded runs with no value "
                f"({', '.join(f'{n} {d}' for n, d in dropped.items() if d)}); "
                f"statistics cover survivors only"
            )
        print(f"## {label}  ({better} is better)")
        for name, v in vals.items():
            if v:
                print(f"  {name} ({len(v)}): {fmt(sorted(v))}   mean {np.mean(v):.4g}")
        print_pairwise(vals, pairs)
        print()

    print("## per-run table (markdown)")
    print("| run | epochs | test top-1 @best-val | test weak @best-val (flow on) | final train weak | flow-off weak | steps→90% |")
    print("|---|---:|---:|---:|---:|---:|---:|")
    for name, r in [(n, r) for runs in arms.values() for n, r in runs.items()]:
        print(f"| {name.replace('_s', ' s')} | {r['epochs_run']} | {r['test_acc']:g} | "
              f"{r['test_acc_modal_1']:g} | {r['final_train_acc_modal_1']:.3g} | "
              f"{r['flowoff_test_acc_modal_1']:g} | {r['steps_to_90_top1']} |")


if __name__ == "__main__":
    main()
