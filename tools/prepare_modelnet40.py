#!/usr/bin/env python3
"""Prepare the ModelNet40 multi-view dataset for this framework.

The upstream data (http://maxwell.cs.umass.edu/mvcnn-data/, linked from the
reference README) ships as per-view PNG renders named
``<class>/<split>/<model>_<shaded...>_vNNN.png`` (12 views per model).  The
reference expects a preprocessed root with ``metadata.json`` plus per-model
array files ``<root>/<split>/<model>.npy`` (reference: src/dataset.py:100-121
— its files are torch-serialized despite the suffix, quirk #14).  This tool
produces the same layout with *real* ``.npy`` files (uint8, (V, H, W, C)),
which both this framework and its torch-fallback reader consume.

Usage:
  python3 tools/prepare_modelnet40.py SRC_DIR OUT_DIR [--views 12] [--size 224]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np


def find_views(src: Path):
    """Group PNG files into (classname, split, model) -> sorted view paths."""
    groups = defaultdict(list)
    pattern = re.compile(r"^(?P<model>.+?)[._-]v?(?P<view>\d{1,3})\.(png|jpg|jpeg)$", re.IGNORECASE)
    for path in src.rglob("*"):
        if path.suffix.lower() not in (".png", ".jpg", ".jpeg"):
            continue
        m = pattern.match(path.name)
        if not m:
            continue
        parts = path.relative_to(src).parts
        split = next((p for p in parts if p in ("train", "test")), None)
        classname = parts[0]
        if split is None:
            continue
        groups[(classname, split, m.group("model"))].append((int(m.group("view")), path))
    return groups


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("out")
    ap.add_argument("--views", type=int, default=12)
    ap.add_argument("--size", type=int, default=224)
    args = ap.parse_args()

    from PIL import Image

    src, out = Path(args.src), Path(args.out)
    groups = find_views(src)
    if not groups:
        print("No per-view images found under", src, file=sys.stderr)
        sys.exit(1)

    classnames = sorted({c for c, _, _ in groups})
    meta = {"classnames": classnames, "train": [], "test": []}

    for (classname, split, model), views in sorted(groups.items()):
        views.sort()
        if len(views) < args.views:
            print(f"skip {model}: only {len(views)} views", file=sys.stderr)
            continue
        imgs = []
        for _, path in views[: args.views]:
            img = Image.open(path).convert("RGB").resize((args.size, args.size), Image.BILINEAR)
            imgs.append(np.asarray(img, np.uint8))
        stack = np.stack(imgs)
        os.makedirs(out / split, exist_ok=True)
        np.save(out / split / f"{model}.npy", stack)
        meta[split].append({"classname": classname, "model": model})

    with open(out / "metadata.json", "w") as f:
        json.dump(meta, f)
    print(
        f"wrote {len(meta['train'])} train / {len(meta['test'])} test models, "
        f"{len(classnames)} classes -> {out}"
    )


if __name__ == "__main__":
    main()
