#!/usr/bin/env python3
"""Run the UNMODIFIED reference implementation out-of-tree.

Copies /root/reference to a scratch directory (never into this repo),
prepends the compatibility shims (gin/argh/torchvision backed by this
repo's config engine — see shims/), applies the torch/numpy environment
patches (compat.py), then drives the reference's own entry points through
the same ``SAVE CONFIG [BINDINGS]`` surface its gin_wrap exposes
(reference: src/utils.py:57-68) — including its stdout/stderr tee.

Usage:
  run_reference.py train SAVE CONFIG [BINDINGS]
  run_reference.py eval  SAVE CONFIG [BINDINGS]

CONFIG is resolved relative to the reference copy (e.g.
``configs/training_guided.gin``).  ``PARITY_TORCH_SEED`` (env), when set,
seeds torch's global RNG before the entry point runs — the reference
constructs its model BEFORE the dataset factory seeds torch
(reference: train.py:44-45 vs src/dataset.py:29-33), so model init is
otherwise nondeterministic run-to-run; the rebuild run gets the matching
seed through its own bindings.
"""

import os
import shutil
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
REF_SRC = "/root/reference"
REF_COPY = os.environ.get("PARITY_REF_COPY", "/tmp/parity_ref")


def ensure_copy():
    if not os.path.exists(os.path.join(REF_COPY, "train.py")):
        shutil.copytree(
            REF_SRC, REF_COPY, ignore=shutil.ignore_patterns("__pycache__"), dirs_exist_ok=True
        )
    return REF_COPY


def main():
    if len(sys.argv) < 4:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    mode, save_path, config = sys.argv[1:4]
    bindings = sys.argv[4] if len(sys.argv) > 4 else ""

    ensure_copy()
    # shims shadow gin/argh/torchvision; the reference copy must shadow this
    # repo's own train.py/eval.py (refcopy's eval.py does `from train import
    # blend_loss`); the repo root provides greedy_multimodal_learning_tpu
    # for the gin shim's backing engine.
    sys.path.insert(0, REPO)
    sys.path.insert(0, REF_COPY)
    sys.path.insert(0, os.path.join(HERE, "shims"))

    from compat import apply_torch_compat

    apply_torch_compat()

    os.environ.setdefault("DATA_DIR", "/tmp/parity_data")

    import torch

    seed = os.environ.get("PARITY_TORCH_SEED")
    if seed is not None:
        torch.manual_seed(int(seed))

    import gin

    config_paths = [os.path.join(REF_COPY, c) for c in config.split("#")]
    gin.parse_config_files_and_bindings(config_paths, bindings.replace("#", "\n"))

    os.makedirs(save_path, exist_ok=True)

    if mode == "train":
        import train as ref_train

        fn = ref_train.train
    elif mode == "eval":
        import eval as ref_eval

        fn = ref_eval.eval_
    else:
        raise SystemExit(f"unknown mode {mode!r}")

    from src.utils import run_with_redirection

    run_with_redirection(
        os.path.join(save_path, "stdout.txt"),
        os.path.join(save_path, "stderr.txt"),
        fn,
    )(save_path)


if __name__ == "__main__":
    main()
