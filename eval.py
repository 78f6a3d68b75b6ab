#!/usr/bin/env python3
"""Evaluation entry point — CLI surface preserved verbatim from the
reference (reference: eval.py, README.md:20-23):

    python3 eval.py SAVE_PATH configs/recording.gin   # squeeze-map recording
    python3 eval.py SAVE_PATH configs/eval.gin        # mmtm-off utilization eval
"""

import logging

import jax

logger = logging.getLogger(__name__)

from greedy_multimodal_learning_tpu import config as cfg
from greedy_multimodal_learning_tpu.analysis import get_rescale_weights
from greedy_multimodal_learning_tpu.bootstrap import build_model_and_loaders, init_state, select_split
from greedy_multimodal_learning_tpu.engine import callbacks as avail_callbacks
from greedy_multimodal_learning_tpu.engine import evalution_loop
from greedy_multimodal_learning_tpu.utils import gin_wrap


@cfg.configurable
def eval_(
    save_path,
    target_data_split="test",
    pretrained_weights_path=None,
    batch_size=128,
    callbacks=(),
    seed=777,
    model="MMTM_MVCNN",
):
    """Evaluate a checkpoint on a data split (reference: eval.py:23-58).

    With ``MMTM_MVCNN.mmtm_off=True`` the dataset-average squeeze maps are
    loaded via the analysis pipeline (reference: src/model.py:39-48) and the
    cross-modal flow is cut during the forward pass."""
    model_scope = model  # gin scope name for model-family bindings
    model, loaders = build_model_and_loaders(model, batch_size)
    target_data = select_split(loaders, target_data_split)

    mmtm_off = bool(cfg.query(model_scope, "mmtm_off", False))
    average_squeezemaps = None
    if mmtm_off:
        average_squeezemaps = get_rescale_weights(
            cfg.query(model_scope, "mmtm_rescale_eval_file_path"),
            cfg.query(model_scope, "mmtm_rescale_training_file_path"),
            validation=False,
            starting_mmtmindice=1,
            mmtmpositions=4,
        )

    # Callbacks by name lookup (reference: eval.py:44-47).  DELIBERATE
    # DEPARTURE (PARITY.md): the reference's `if name in
    # avail_callbacks.__dict__` *silently skips* unknown names; here a
    # typo'd name fails loudly instead of silently changing the run.
    callbacks_constructed = []
    for name in callbacks:
        ctor = getattr(avail_callbacks, name, None)
        if ctor is None:
            raise KeyError(f"Unknown callback {name!r} in eval_.callbacks")
        callbacks_constructed.append(ctor())

    state = init_state(model, target_data, batch_size, seed)

    from greedy_multimodal_learning_tpu.models import apply_pretrained_trunks, resolve_pretrained_path

    pretrained_path = resolve_pretrained_path()
    if pretrained_path:
        state = apply_pretrained_trunks(state, pretrained_path, model.num_towers)

    evalution_loop(
        model=model,
        state=state,
        config=cfg.CONFIG,
        save_path=save_path,
        test=target_data,
        test_steps=len(target_data),
        custom_callbacks=callbacks_constructed,
        pretrained_weights_path=pretrained_weights_path,
        nummodalities=model.num_towers,
        average_squeezemaps=average_squeezemaps,
        mmtm_off=mmtm_off,
    )


if __name__ == "__main__":
    gin_wrap(eval_)
