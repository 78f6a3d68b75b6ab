#!/usr/bin/env python3
"""Fused multi-checkpoint evaluation entry point (BASELINE config 5).

Evaluates K checkpoints in ONE pass over the data by vmapping the forward
over stacked parameter trees (engine/sweep.py) — a TPU-native capability
beyond the reference, whose eval.py re-runs the whole pipeline per
checkpoint (reference: eval.py:23-58).

    python3 eval_sweep.py SAVE_PATH configs/eval_sweep_example.gin \
        "eval_sweep_.checkpoints=['RUN/model_best_val.pt','RUN/model_last_epoch.pt']"

Checkpoint entries may be globs (e.g. ``'RUN/ckpt_*.pt'``).  Writes
``SAVE_PATH/sweep.csv`` with one row per checkpoint and prints the table.
"""

import glob
import logging
import os
import time

logger = logging.getLogger(__name__)

from greedy_multimodal_learning_tpu import config as cfg
from greedy_multimodal_learning_tpu.bootstrap import build_model_and_loaders, init_state, select_split
from greedy_multimodal_learning_tpu.engine.checkpoint import load_into_state
from greedy_multimodal_learning_tpu.engine.sweep import eval_sweep
from greedy_multimodal_learning_tpu.utils import gin_wrap


@cfg.configurable
def eval_sweep_(
    save_path,
    checkpoints=(),
    target_data_split="test",
    batch_size=128,
    seed=777,
    model="MMTM_MVCNN",
):
    """Evaluate every checkpoint in ``checkpoints`` over one data pass."""
    paths = []
    for pattern in checkpoints:
        # .jax.pkl files are exact-resume sidecars, not checkpoints: a glob
        # like 'RUN/model_*' must not sweep them as (random-init) rows.
        hits = sorted(p for p in glob.glob(pattern) if not p.endswith(".jax.pkl"))
        if not hits:
            raise FileNotFoundError(f"no checkpoint matches {pattern!r}")
        paths.extend(hits)
    if not paths:
        raise ValueError("eval_sweep_.checkpoints is empty — nothing to evaluate")

    model, loaders = build_model_and_loaders(model, batch_size)
    target = select_split(loaders, target_data_split)
    state = init_state(model, target, batch_size, seed)

    trees = []
    for p in paths:
        st = load_into_state(state, p)
        trees.append({"params": st.params, "batch_stats": st.batch_stats, "mmtm": st.mmtm})

    t0 = time.time()
    results = eval_sweep(model, trees, target)
    dt = time.time() - t0
    n = len(target.dataset)
    logger.info("sweep: %d checkpoints x %d samples in one pass, %.2fs", len(paths), n, dt)

    os.makedirs(save_path, exist_ok=True)
    csv_path = os.path.join(save_path, "sweep.csv")
    metric_keys = sorted(results[0])
    with open(csv_path, "w") as f:
        f.write("checkpoint," + ",".join(metric_keys) + "\n")
        for p, res in zip(paths, results):
            f.write(p + "," + ",".join(f"{res[k]:.6f}" for k in metric_keys) + "\n")
    header = f"{'checkpoint':60s} " + " ".join(f"{k:>12s}" for k in metric_keys)
    print(header)
    for p, res in zip(paths, results):
        print(f"{p[-60:]:60s} " + " ".join(f"{res[k]:12.4f}" for k in metric_keys))
    print(f"-> {csv_path}")
    return csv_path


if __name__ == "__main__":
    gin_wrap(eval_sweep_)
