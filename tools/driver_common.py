"""Shared phase runner for the experiment drivers.

Two driving modes for a train/eval phase (identical CLI surface either way,
reference: README.md:14-23):

- subprocess (default): one fresh ``python train.py/eval.py`` per phase, the
  reference's own driving mode.  Fully isolated, but every phase re-pays
  interpreter + jax import, jit compilation, and — on the remote-tunneled TPU
  backend — the device-corpus upload.
- in-process (``--in-process``): phases run via run_api.run_entry inside the
  driver process, paying interpreter start, jax import, and remote-backend
  initialization once per suite instead of once per phase (each phase still
  re-traces and re-uploads its corpus; compiles are amortized by the
  persistent compilation cache either way).  Equivalence with the subprocess
  mode is pinned by tests/test_run_api.py.  The drivers stay resumable, so a
  crashed in-process suite can be re-invoked (in either mode) and picks up
  where it left off.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(cmd, log_path, env_extra=None):
    """Run one subprocess with stdout/stderr appended to ``log_path``;
    prints the command and its rc/duration to the driver's own stdout."""
    print(f"+ {' '.join(cmd)}", flush=True)
    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    t0 = time.time()
    with open(log_path, "a") as log:
        proc = subprocess.run(cmd, cwd=REPO, stdout=log, stderr=subprocess.STDOUT, env=env)
    print(f"  -> rc={proc.returncode} in {time.time() - t0:.0f}s", flush=True)
    return proc.returncode


def run_phase(entry, save, config, bindings, log_path, in_process=False, env_extra=None):
    """Run one train/eval phase; returns a process-style rc (0 = success)."""
    if in_process:
        if env_extra:
            # jax is already initialized in this process; backend-selecting
            # env vars cannot take effect — fail loudly instead of running
            # the phase on the wrong backend.
            raise ValueError(
                f"env_extra={env_extra!r} cannot be applied in-process; "
                "use subprocess mode for phases that need their own environment"
            )
        if REPO not in sys.path:
            sys.path.insert(0, REPO)
        from greedy_multimodal_learning_tpu.run_api import run_entry

        print(f"+ [in-process] {entry} {save} {config}", flush=True)
        t0 = time.time()
        try:
            run_entry(entry, save, config, bindings)
        except Exception:
            with open(log_path, "a") as log:
                log.write(traceback.format_exc())
            print(f"  -> FAILED in {time.time() - t0:.0f}s (traceback in {log_path})", flush=True)
            return 1
        print(f"  -> ok in {time.time() - t0:.0f}s", flush=True)
        return 0

    script = {"train": "train.py", "eval": "eval.py"}[entry]
    return sh([sys.executable, script, save, config, bindings], log_path, env_extra)
