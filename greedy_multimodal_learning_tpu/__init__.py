"""greedy_multimodal_learning_tpu — TPU-native balanced multi-modal learning.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
SebastianHafner/greedy_multimodal_learning (ICML'22 "Characterizing and
overcoming the greedy nature of learning in multi-modal deep neural
networks", arXiv:2202.05306):

* two-tower (N-tower) CNN classifiers fused at multiple depths by MMTM
  squeeze-excitation modules (reference: src/model.py, src/balanced_mmtm.py),
* guided balanced training driven by per-modality conditional learning
  speed measured from gradient/weight norm ratios (reference:
  src/callbacks.py:174-267), re-architected as a fully device-resident
  controller inside one jitted train step,
* the conditional-utilization-rate analysis pipeline (recording pass +
  cross-modal-flow-off evaluation; reference: eval.py, configs/recording.gin,
  configs/eval.gin, src/balanced_mmtm.py:157-206).

Environment contract mirrors the reference package init
(reference: src/__init__.py:12-16): DATA_DIR / RESULTS_DIR env vars with
defaults, and root logging configured at import.
"""

import os

DATA_DIR = os.environ.get("DATA_DIR", os.path.join(os.path.dirname(__file__), "..", "data"))
RESULTS_DIR = os.environ.get("RESULTS_DIR", os.path.join(os.path.dirname(__file__), "..", "results"))

from .utils.logging_utils import configure_logger

configure_logger("")

# Persistent XLA compilation cache: first compiles of the fused train step
# are expensive (minutes on a remote-compile TPU backend); cached program
# binaries make every subsequent process start in seconds.
def _enable_compilation_cache():
    try:
        import jax

        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "gml_tpu_jax"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # jax unavailable or config API changed: non-fatal
        pass


_enable_compilation_cache()

__version__ = "0.1.0"
