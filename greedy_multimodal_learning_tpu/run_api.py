"""Programmatic run API: drive train/eval phases in-process.

``run_entry("train", save, config, bindings)`` is the in-process equivalent
of ``python train.py SAVE CONFIG [BINDINGS]`` (reference CLI surface:
README.md:14-23, src/utils.py:58-68): it clears previously parsed bindings,
parses the '#'-separated config mixins and bindings, writes
``operative_config.gin``, tees stdout/stderr into the save dir, and invokes
the entry.  Sequential calls in one process therefore behave like fresh CLI
invocations — each phase re-parses config, re-seeds its data pipeline,
builds a fresh model/trainer (so jit closures re-trace), and re-uploads the
device corpus.  What stays warm across phases is the per-process fixed
cost: interpreter start, jax import, and remote-backend/tunnel
initialization; compiled executables are re-used across phases AND
processes through the persistent XLA compilation cache the package enables
at import (``__init__.py::_enable_compilation_cache``), so the saving is
real on short eval phases but comes from process setup + compile-cache
hits, not from retained traces.

Equivalence with the subprocess CLI is pinned by tests/test_run_api.py
(bit-identical history.csv / recording pickle / flow-off metrics).
"""

import gc
import logging
import os

from . import config as cfg
from .utils.logging_utils import run_with_redirection

logger = logging.getLogger(__name__)

__all__ = ["run_entry"]


def run_entry(entry, save_path, config, bindings="", redirect=True):
    """Run one train/eval phase in-process.

    Args:
      entry: ``"train"`` or ``"eval"`` — which CLI entry to emulate.
      save_path: run directory (created if missing), as the CLI's SAVE_PATH.
      config: '#'-separated gin config mixin paths, as the CLI's CONFIG.
      bindings: '#'-separated ``Name.param=value`` lines, as the CLI's
        optional BINDINGS argument.
      redirect: tee stdout/stderr to ``save_path/stdout.txt``/``stderr.txt``
        like ``gin_wrap`` does (reference: src/utils.py:62-67).

    Returns the entry function's return value.  All parsed bindings are
    cleared afterwards so later phases (or library use) start clean.
    """
    from . import entries

    fns = {"train": entries.train, "eval": entries.eval_}
    if entry not in fns:
        raise ValueError(f"entry must be one of {sorted(fns)}, got {entry!r}")
    fn = fns[entry]

    if entry == "train":
        # train.py initializes multi-host coordination at module scope;
        # the in-process path must match (idempotent no-op off-cluster).
        from .parallel import maybe_initialize_distributed

        maybe_initialize_distributed()

    cfg.clear_config()
    try:
        # Inside the try: a half-parsed bindings string (ConfigError on a
        # later line) must not leak applied lines into the caller's next
        # phase — the finally clears whatever was applied.
        cfg.parse_config_files_and_bindings(config.split("#"), bindings.replace("#", "\n"))
        if not os.path.exists(save_path):
            logger.info("Creating folder %s", save_path)
            os.makedirs(save_path, exist_ok=True)
        with open(os.path.join(save_path, "operative_config.gin"), "w") as f:
            f.write(cfg.operative_config_str())

        call = fn
        if redirect:
            call = run_with_redirection(
                os.path.join(save_path, "stdout.txt"),
                os.path.join(save_path, "stderr.txt"),
                fn,
            )
        return call(save_path)
    finally:
        cfg.clear_config()
        # Drop the finished phase's device buffers (train state, corpus
        # cache) before the next phase allocates its own.
        gc.collect()
