#!/usr/bin/env python3
"""Batch-inference (serving) entry point — new capability beyond the
reference (which only exposes loss/accuracy evaluation).

    python3 predict.py SAVE_PATH CONFIG.gin \
        "predict_.pretrained_weights_path='RUN/model_best_val.pt'"

Loads a checkpoint, runs the jitted predict step over the selected split,
and writes ``SAVE_PATH/predictions.csv`` with one row per sample
(index, model name, true class, predicted class, confidence) plus a
throughput line to stdout.
"""

import logging
import os
import time

import jax

logger = logging.getLogger(__name__)

from greedy_multimodal_learning_tpu import config as cfg
from greedy_multimodal_learning_tpu.bootstrap import build_model_and_loaders, init_state, select_split
from greedy_multimodal_learning_tpu.engine.framework import Trainer
from greedy_multimodal_learning_tpu.utils import gin_wrap


@cfg.configurable
def predict_(
    save_path,
    target_data_split="test",
    pretrained_weights_path=None,
    batch_size=128,
    seed=777,
    model="MMTM_MVCNN",
    fold_bn=False,
):
    """Run inference over a split and write predictions.csv.

    ``fold_bn=True`` folds the checkpoint's running BN statistics into the
    conv kernels before serving (engine/fold_bn.py) — numerically
    equivalent at eval, removes every BN normalize from the graph."""
    model, loaders = build_model_and_loaders(model, batch_size)
    target = select_split(loaders, target_data_split)
    state = init_state(model, target, batch_size, seed)

    trainer = Trainer(model=model, optimizer=None, state=state, nummodalities=model.num_towers)
    if pretrained_weights_path:
        trainer.load_weights(pretrained_weights_path)
    if fold_bn:
        from greedy_multimodal_learning_tpu.engine.fold_bn import fold_batchnorm

        fp, fs = fold_batchnorm(trainer.state.params, trainer.state.batch_stats)
        trainer.state = trainer.state.replace(params=fp, batch_stats=fs)
        logger.info("Serving with BatchNorm folded into conv weights")

    t0 = time.time()
    out = trainer.predict(target)
    dt = time.time() - t0
    n = len(out["indices"])

    os.makedirs(save_path, exist_ok=True)
    csv_path = os.path.join(save_path, "predictions.csv")
    ds = target.dataset
    correct = 0
    with open(csv_path, "w") as f:
        f.write("index,model,true_class,predicted_class,confidence\n")
        for row, idx in enumerate(out["indices"]):
            sample_meta = ds.samples[int(idx)]
            true_cls = sample_meta["classname"]
            pred_cls = ds.classnames[int(out["predictions"][row])]
            correct += pred_cls == true_cls
            conf = float(out["probabilities"][row].max())
            f.write(f"{int(idx)},{sample_meta['model']},{true_cls},{pred_cls},{conf:.6f}\n")
    acc = correct / max(n, 1)
    print(f"predict: {n} samples in {dt:.2f}s ({n / max(dt, 1e-9):.1f} samples/s), "
          f"top-1 {100 * acc:.2f}% -> {csv_path}")
    return csv_path


if __name__ == "__main__":
    gin_wrap(predict_)
