"""Conditional-utilization-rate analysis pipeline.

Reproduces the reference's two-pass workflow (reference: README.md:20-23,
src/balanced_mmtm.py:157-206):

1. a *recording* eval run over the train split stores per-batch MMTM squeeze
   maps + sample indices into ``eval_history_batch/history.pickle``
   (configs/recording.gin),
2. :func:`get_mmtm_outputs` reassembles them into dataset order via
   ``argsort(test_indices)`` (reference: src/balanced_mmtm.py:174),
3. :func:`get_rescale_weights` selects the original training run's
   train (or val) indices from its own history.pickle and averages the
   squeeze maps over those samples — yielding per-MMTM per-view
   dataset-average squeeze vectors consumed by the ``mmtm_off`` eval
   (configs/eval.gin).

Reads both rebuild-produced pickles (numpy arrays) and original reference
pickles (torch tensors — ``np.array`` converts; torch is only needed to
unpickle those).
"""

from __future__ import annotations

import os
import pickle

import numpy as np


def _load_history(save_path):
    with open(os.path.join(save_path, "history.pickle"), "rb") as f:
        return pickle.load(f)


def get_mmtm_outputs(eval_save_path, mmtm_recorded, key):
    """Reassemble recorded squeeze maps into dataset order
    (reference: src/balanced_mmtm.py:157-176)."""
    his_epo = _load_history(eval_save_path)

    data = []
    for batch in his_epo[key][0]:
        assert mmtm_recorded == len(batch)
        for mmtmid in range(len(batch)):
            if len(data) < mmtmid + 1:
                data.append({})
            for i, viewdd in enumerate(batch[mmtmid]):
                data[mmtmid].setdefault("view_%d" % i, []).append(np.array(viewdd))

    order = np.argsort(np.asarray(his_epo["test_indices"][0]))
    for mmtmid in range(len(data)):
        for k, v in data[mmtmid].items():
            data[mmtmid][k] = np.concatenate(v)[order]
    return data


def get_rescale_weights(
    eval_save_path,
    training_save_path,
    key="test_squeezedmaps_array_list",
    validation=False,
    starting_mmtmindice=1,
    mmtmpositions=4,
    device=None,
):
    """Per-MMTM per-view dataset-average squeeze maps
    (reference: src/balanced_mmtm.py:179-206).  Position indices below
    ``starting_mmtmindice`` have no MMTM module and map to None."""
    data = get_mmtm_outputs(eval_save_path, mmtmpositions - starting_mmtmindice, key)

    his_ori = _load_history(training_save_path)
    selected_indices = np.asarray(
        his_ori["val_indices"][0] if validation else his_ori["train_indices"][0]
    )

    mmtm_weights = []
    for mmtmid in range(mmtmpositions):
        if mmtmid < starting_mmtmindice:
            mmtm_weights.append(None)
        else:
            weights = [
                data[mmtmid - starting_mmtmindice][k][selected_indices].mean(0)
                for k in sorted(data[mmtmid - starting_mmtmindice].keys())
            ]
            mmtm_weights.append([np.asarray(w, np.float32) for w in weights])
    return mmtm_weights
