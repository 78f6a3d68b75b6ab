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
    (reference: src/balanced_mmtm.py:157-176).

    The recorded history nests epoch -> batch -> fusion-module -> view;
    per (module, view) the per-batch chunks are concatenated and reordered
    by ``argsort(test_indices)`` into dataset order.  Returns one
    {view_id: (num_samples, C) array} dict per fusion module."""
    recording = _load_history(eval_save_path)

    per_module = [{} for _ in range(mmtm_recorded)]
    for batch_maps in recording[key][0]:
        assert mmtm_recorded == len(batch_maps)
        for module_maps, view_maps in zip(per_module, batch_maps):
            for view_id, chunk in enumerate(view_maps):
                module_maps.setdefault(view_id, []).append(np.array(chunk))

    dataset_order = np.argsort(np.asarray(recording["test_indices"][0]))
    return [
        {view_id: np.concatenate(chunks)[dataset_order] for view_id, chunks in module_maps.items()}
        for module_maps in per_module
    ]


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
    ``starting_mmtmindice`` have no MMTM module and map to None.

    Fast path: a recording pass run with ``evalution_loop.ondevice_rescale``
    reduces the maps on device and writes ``rescale_means.pkl`` next to the
    history pickle (analysis/ondevice_rescale.py); when that file matches
    this call's (key, validation) selection, the means are returned directly
    — no per-sample payload was ever fetched or stored.  Equivalence with
    the pickle pipeline is pinned by tests/test_ondevice_rescale.py."""
    from .ondevice_rescale import RESCALE_MEANS_FILENAME

    fast = os.path.join(eval_save_path, RESCALE_MEANS_FILENAME)
    if os.path.exists(fast):
        with open(fast, "rb") as f:
            blob = pickle.load(f)
        # identity check: the blob must have been averaged over exactly the
        # index set THIS call would select from THIS training run (guards
        # against a blob built from a different training path or selection)
        training_history = _load_history(training_save_path)
        want = np.asarray(
            training_history["val_indices"][0] if validation else training_history["train_indices"][0]
        )
        selection_matches = "selected" in blob and np.array_equal(
            np.asarray(blob["selected"]), np.asarray(want)
        )
        if (
            blob.get("key") == key
            and bool(blob.get("validation")) == bool(validation)
            and selection_matches
        ):
            modules = blob["means"]  # {module_index: {view_index: (C,)}}
            weights = []
            for position in range(mmtmpositions):
                if position < starting_mmtmindice:
                    weights.append(None)
                    continue
                per_view = modules[position - starting_mmtmindice]
                weights.append(
                    [np.asarray(per_view[v], np.float32) for v in sorted(per_view)]
                )
            return weights
        # selection mismatch: fall through to the per-sample pickle pipeline

    modules = get_mmtm_outputs(eval_save_path, mmtmpositions - starting_mmtmindice, key)

    training_history = _load_history(training_save_path)
    selected_indices = np.asarray(
        training_history["val_indices"][0] if validation else training_history["train_indices"][0]
    )

    mmtm_weights = []
    for position in range(mmtmpositions):
        if position < starting_mmtmindice:
            mmtm_weights.append(None)
            continue
        module_maps = modules[position - starting_mmtmindice]
        mmtm_weights.append(
            [
                np.asarray(module_maps[view_id][selected_indices].mean(0), np.float32)
                for view_id in sorted(module_maps)
            ]
        )
    return mmtm_weights
