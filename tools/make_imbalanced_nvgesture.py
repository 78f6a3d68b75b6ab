#!/usr/bin/env python3
"""Generate a modality-imbalanced synthetic NVGesture-layout clip dataset.

The real NVGesture corpus is unreachable in this zero-egress environment,
so 3-modality run-level experiments (BASELINE config 4) use this
generator: the MultimodalClipDataset on-disk layout (metadata.json +
per-sample ``<split>/<model>.npy`` (M, T, H, W, 3) uint8 clips,
data/nvgesture.py) with a *graded* modality imbalance:

* modality 0 ("rgb"):   high-contrast class pattern, light noise,
* modality 1 ("depth"): mid-contrast, moderate noise,
* modality 2 ("flow"):  low-contrast, heavy noise,

so greedy learning favors modality 0 and the balancing controller has two
successively weaker modalities to curate — the N-modality analogue of the
2-view ModelNet setup in make_imbalanced_modelnet.py.  Frames carry the
class pattern under a per-frame roll so the temporal axis is informative.
Fully seeded: regenerating in a fresh workdir reproduces the dataset
exactly.

Usage:
  python3 tools/make_imbalanced_nvgesture.py OUT_DIR [--n-train 400]
      [--n-test 150] [--size 32] [--frames 8] [--nclasses 10] [--seed 0]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

MODALITY_CONTRAST = (40.0, 12.0, 5.0)
MODALITY_NOISE = (12.0, 24.0, 32.0)


def class_patterns(nclasses: int, size: int, cells: int = 8, seed: int = 4321) -> np.ndarray:
    rng = np.random.default_rng(seed)
    coarse = rng.uniform(-1.0, 1.0, (nclasses, cells, cells)).astype(np.float32)
    reps = size // cells
    return np.repeat(np.repeat(coarse, reps, axis=1), reps, axis=2)


def render_clip(
    pattern: np.ndarray,
    rng: np.random.Generator,
    *,
    num_modalities: int,
    frames: int,
    max_shift: int,
) -> np.ndarray:
    size = pattern.shape[0]
    clip = np.empty((num_modalities, frames, size, size, 3), np.uint8)
    dy, dx = rng.integers(-max_shift, max_shift + 1, 2)
    base = np.roll(np.roll(pattern, dy, axis=0), dx, axis=1)
    for m in range(num_modalities):
        contrast = MODALITY_CONTRAST[m % len(MODALITY_CONTRAST)]
        noise = MODALITY_NOISE[m % len(MODALITY_NOISE)]
        for t in range(frames):
            frame_pat = np.roll(base, t, axis=1)  # temporal motion
            img = 128.0 + contrast * frame_pat[..., None] + rng.normal(
                0.0, noise, (size, size, 3)
            )
            clip[m, t] = np.clip(img, 0, 255).astype(np.uint8)
    return clip


def generate(
    out: str,
    *,
    n_train: int = 400,
    n_test: int = 150,
    size: int = 32,
    frames: int = 8,
    nclasses: int = 10,
    num_modalities: int = 3,
    max_shift: int = 8,
    seed: int = 0,
) -> str:
    rng = np.random.default_rng(seed)
    patterns = class_patterns(nclasses, size)
    classnames = [f"gesture_{i:02d}" for i in range(nclasses)]
    meta = {"classnames": classnames, "train": [], "test": []}
    os.makedirs(out, exist_ok=True)
    for split, n in (("train", n_train), ("test", n_test)):
        os.makedirs(os.path.join(out, split), exist_ok=True)
        for i in range(n):
            cls = i % nclasses
            model = f"{classnames[cls]}_{split}_{i:04d}"
            meta[split].append({"classname": classnames[cls], "model": model})
            clip = render_clip(
                patterns[cls],
                rng,
                num_modalities=num_modalities,
                frames=frames,
                max_shift=max_shift,
            )
            np.save(os.path.join(out, split, f"{model}.npy"), clip)
    with open(os.path.join(out, "metadata.json"), "w") as f:
        json.dump(meta, f)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--n-train", type=int, default=400)
    ap.add_argument("--n-test", type=int, default=150)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--nclasses", type=int, default=10)
    ap.add_argument("--num-modalities", type=int, default=3)
    ap.add_argument("--max-shift", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    generate(
        args.out,
        n_train=args.n_train,
        n_test=args.n_test,
        size=args.size,
        frames=args.frames,
        nclasses=args.nclasses,
        num_modalities=args.num_modalities,
        max_shift=args.max_shift,
        seed=args.seed,
    )
    print(f"wrote {args.n_train}+{args.n_test} clips to {args.out}")


if __name__ == "__main__":
    main()
