"""NVGesture-style multimodal video clip dataset (BASELINE config 4).

The reference repo ships only the ModelNet40 multiview loader; the paper's
second benchmark (NVGesture: RGB + depth + optical flow through 3D-CNN
towers) is new capability here.  The on-disk layout mirrors the ModelNet40
convention (metadata.json + per-sample array files, reference:
src/dataset.py:100-121) so the tooling stays uniform:

* ``metadata.json``: {classnames, train: [{classname, model}], test: [...]},
* ``root/<split>/<model>.npy``: (M, T, H, W, C) uint8 clip stack — one
  leading entry per modality.

Batches flow through the same BatchPipeline / device-preprocess machinery
as images; the (B, M, T, H, W, C) stack feeds MMTM3DCNN directly.
"""

from __future__ import annotations

import json
import os
import random
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from .. import config as cfg
from .modelnet import reference_val_split


class MultimodalClipDataset:
    def __init__(self, root_dir, split, specific_modalities: Optional[Sequence[int]] = None, cache: bool = True):
        self.root_dir = Path(root_dir)
        with open(self.root_dir / "metadata.json") as f:
            self.metadata = json.load(f)
        self.samples = self.metadata[split]
        self.classnames = self.metadata["classnames"]
        self.split = split
        self.specific_modalities = list(specific_modalities) if specific_modalities is not None else None
        self._cache = {} if cache else None

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx):
        if self._cache is not None and idx in self._cache:
            return self._cache[idx]
        sample = self.samples[idx]
        class_id = self.classnames.index(sample["classname"])
        clips = np.load(self.root_dir / self.split / f"{sample['model']}.npy")
        if self.specific_modalities is not None:
            clips = clips[self.specific_modalities]
        if clips.dtype != np.uint8:
            # same convention as the modelnet loader (_to_uint8_hwc):
            # floats in [0,1] rescale; a bare astype would truncate them
            # all to zero (all-black clips, silent chance-level training)
            if clips.dtype.kind == "f" and clips.max() <= 1.0 + 1e-6:
                clips = (clips * 255.0).round()
            clips = np.clip(clips, 0, 255).astype(np.uint8)
        item = (idx, clips, class_id)
        if self._cache is not None:
            self._cache[idx] = item
        return item


@cfg.configurable
def get_nvgesturedata(
    root_dir=None,
    valid_size=0.2,
    batch_size=8,
    random_seed_for_validation=10,
    num_modalities=3,
    specific_modalities=None,
    seed=777,
    cache=True,
    device_cache="auto",
):
    """Loader factory following the same shape as ``get_mvdcndata``
    (reference: src/dataset.py:15-92): deterministic val split, train
    shuffled, returns (train, valid, test) pipelines.  ``device_cache``
    as in ``get_mvdcndata`` (HBM-resident corpus, on-device batch gather)."""
    from .pipeline import BatchPipeline, wrap_device_cache

    if root_dir is None:
        root_dir = os.environ.get("DATA_DIR", ".")
    mods = specific_modalities if specific_modalities is not None else list(range(num_modalities))
    test_ds = MultimodalClipDataset(root_dir, "test", specific_modalities=mods, cache=cache)
    train_ds = MultimodalClipDataset(root_dir, "train", specific_modalities=mods, cache=cache)
    training_idx, valid_idx = reference_val_split(len(train_ds), valid_size, random_seed_for_validation)

    # Multi-host: disjoint per-process slices, same as get_mvdcndata —
    # without this every host would feed identical rows into the global
    # batch (N-fold duplication).
    from ..parallel.multihost import process_local_indices

    training_idx = process_local_indices(training_idx)
    valid_idx = process_local_indices(valid_idx)
    test_idx = process_local_indices(range(len(test_ds)))
    return (
        wrap_device_cache(BatchPipeline(train_ds, training_idx, batch_size, shuffle=True, seed=seed), device_cache),
        wrap_device_cache(BatchPipeline(train_ds, valid_idx, batch_size, shuffle=False), device_cache),
        wrap_device_cache(BatchPipeline(test_ds, test_idx, batch_size, shuffle=False), device_cache),
    )


def make_synthetic_nvgesture(
    root_dir,
    *,
    n_train=12,
    n_test=6,
    num_modalities=3,
    frames=4,
    image_size=16,
    nclasses=4,
    seed=0,
):
    """Synthetic clip dataset for tests/CPU smoke runs."""
    rng = np.random.default_rng(seed)
    os.makedirs(root_dir, exist_ok=True)
    classnames = [f"gesture_{i}" for i in range(nclasses)]
    meta = {"classnames": classnames, "train": [], "test": []}
    for split, n in (("train", n_train), ("test", n_test)):
        os.makedirs(os.path.join(root_dir, split), exist_ok=True)
        for i in range(n):
            cls = i % nclasses
            model = f"{classnames[cls]}_{split}_{i:04d}"
            meta[split].append({"classname": classnames[cls], "model": model})
            clip = rng.integers(0, 255, (num_modalities, frames, image_size, image_size, 3), dtype=np.uint8)
            # class-keyed brightness spread over [20, 220] for ANY nclasses
            # (a `24 + 52*cls` style literal overflows uint8 at cls >= 5)
            clip[:, :, : image_size // 2] = 20 + (cls * 200) // max(nclasses - 1, 1)
            np.save(os.path.join(root_dir, split, f"{model}.npy"), clip)
    with open(os.path.join(root_dir, "metadata.json"), "w") as f:
        json.dump(meta, f)
    return root_dir
