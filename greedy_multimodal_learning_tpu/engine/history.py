"""History sink: history.csv (scalars) + history.pickle (full structure).

Schema-compatible with the reference (reference: src/training_loop.py:23-75):
the pickle is the *data interchange format* consumed by the
conditional-utilization analysis (reference: src/balanced_mmtm.py:158,189),
so key names (``train_indices``, ``test_squeezedmaps_array_list``, ...) and
nesting (epoch -> batch -> mmtm position -> view) are preserved exactly.
"""

from __future__ import annotations

import logging
import os
import pickle

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)

TYPES_TO_SAVE_IN_CSV = (int, float, complex, np.int64, np.int32, np.float32, np.float64, str, bool)


def append_to_history(epoch, logs, H):
    """Accumulate epoch logs into the in-memory history dict
    (reference: src/training_loop.py:70-75)."""
    for key, value in logs.items():
        H.setdefault(key, []).append(value)


def save_history(epoch, logs, save_path, H, save_with_structure=False):
    """Write history.csv with scalar-typed entries; optionally pickle the
    full structure (reference: src/training_loop.py:53-67)."""
    out = ""
    for key, value in logs.items():
        if isinstance(value, TYPES_TO_SAVE_IN_CSV):
            out += f"{key}={value}\t"
    logger.info(out)
    logger.info("Saving history to %s", os.path.join(save_path, "history.csv"))
    H_tosave = {}
    for key, value in H.items():
        if value and isinstance(value[-1], TYPES_TO_SAVE_IN_CSV):
            H_tosave[key] = value
    pd.DataFrame(H_tosave).to_csv(os.path.join(save_path, "history.csv"), index=False)
    if save_with_structure:
        with open(os.path.join(save_path, "history.pickle"), "wb") as f:
            pickle.dump(H, f, pickle.HIGHEST_PROTOCOL)
