#!/usr/bin/env python3
"""Generate the shared reduced-scale parity dataset.

One dataset, two consumers: the reference implementation reads the files
with ``torch.load`` (its ``.npy`` files are torch-serialized — quirk #14,
reference: src/dataset.py:121), the rebuild reads them through
``load_view_stack``'s torch fallback.  Files are therefore written
torch-serialized so BOTH pipelines consume byte-identical inputs.

The two views are deliberately IMBALANCED — the regime the guided
controller targets (reference README: the stronger modality dominates and
curation re-balances):

* view 0 (strong): the top half of the image carries a clean per-class
  brightness level (+ mild pixel noise) — quickly learnable,
* view 1 (weak): the same class level but with a large per-sample jitter
  that overlaps neighbouring classes — learnable, slowly and partially.

Usage: make_dataset.py OUT_DIR [--classes 10 --train-per-class 30
--test-per-class 10 --image-size 64 --seed 0]
"""

import argparse
import json
import os
import sys

import numpy as np
import torch

# Full ModelNet40 class list (reference: src/model.py:30-34) so the
# northstar-scale parity dataset (--classes 40) uses the real label space.
CLASSNAMES = [
    "airplane", "bathtub", "bed", "bench", "bookshelf", "bottle", "bowl", "car", "chair",
    "cone", "cup", "curtain", "desk", "door", "dresser", "flower_pot", "glass_box",
    "guitar", "keyboard", "lamp", "laptop", "mantel", "monitor", "night_stand",
    "person", "piano", "plant", "radio", "range_hood", "sink", "sofa", "stairs",
    "stool", "table", "tent", "toilet", "tv_stand", "vase", "wardrobe", "xbox",
]


def make_parity_dataset(root, *, nclasses=10, train_per_class=30, test_per_class=10,
                         image_size=64, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    classnames = CLASSNAMES[:nclasses]
    levels = np.linspace(20, 220, nclasses)
    meta = {"classnames": classnames, "train": [], "test": []}
    half = image_size // 2
    for split, per_class in (("train", train_per_class), ("test", test_per_class)):
        os.makedirs(os.path.join(root, split), exist_ok=True)
        order = [(c, i) for i in range(per_class) for c in range(nclasses)]
        for c, i in order:
            model = f"{classnames[c]}_{split}_{i:04d}"
            meta[split].append({"classname": classnames[c], "model": model})
            views = rng.integers(0, 255, (2, image_size, image_size, 3), dtype=np.uint8)
            # view 0: clean class level in the top half
            v0 = levels[c] + rng.normal(0, 8, (half, image_size, 3))
            views[0, :half] = np.clip(v0, 0, 255).astype(np.uint8)
            # view 1: class level with heavy per-sample jitter (class overlap)
            jitter = rng.uniform(-45, 45)
            v1 = levels[c] + jitter + rng.normal(0, 8, (half, image_size, 3))
            views[1, :half] = np.clip(v1, 0, 255).astype(np.uint8)
            # torch-serialized on purpose (quirk #14): both pipelines read it
            torch.save(views, os.path.join(root, split, f"{model}.npy"))
    with open(os.path.join(root, "metadata.json"), "w") as f:
        json.dump(meta, f)
    return root


def main():
    p = argparse.ArgumentParser()
    p.add_argument("out_dir")
    p.add_argument("--classes", type=int, default=10)
    p.add_argument("--train-per-class", type=int, default=30)
    p.add_argument("--test-per-class", type=int, default=10)
    p.add_argument("--image-size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()
    make_parity_dataset(
        a.out_dir, nclasses=a.classes, train_per_class=a.train_per_class,
        test_per_class=a.test_per_class, image_size=a.image_size, seed=a.seed,
    )
    print(f"parity dataset written to {a.out_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
