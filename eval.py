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
from greedy_multimodal_learning_tpu import data as dataset
from greedy_multimodal_learning_tpu.analysis import get_rescale_weights
from greedy_multimodal_learning_tpu.engine import callbacks as avail_callbacks
from greedy_multimodal_learning_tpu.engine import create_train_state, evalution_loop
from greedy_multimodal_learning_tpu.models import build_model_from_config
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
    if model == "MMTM_3DCNN":
        from greedy_multimodal_learning_tpu.data.nvgesture import get_nvgesturedata
        from greedy_multimodal_learning_tpu.models import build_3dcnn_from_config

        model = build_3dcnn_from_config()
        train_loader, val_loader, test_loader = get_nvgesturedata(batch_size=batch_size)
    else:
        model = build_model_from_config()
        train_loader, val_loader, test_loader = dataset.get_mvdcndata(batch_size=batch_size)

    if target_data_split == "test":
        target_data = test_loader
    elif target_data_split == "train":
        target_data = train_loader
    elif target_data_split == "val":
        target_data = val_loader
    else:
        raise NotImplementedError

    mmtm_off = bool(cfg.query("MMTM_MVCNN", "mmtm_off", False))
    average_squeezemaps = None
    if mmtm_off:
        average_squeezemaps = get_rescale_weights(
            cfg.query("MMTM_MVCNN", "mmtm_rescale_eval_file_path"),
            cfg.query("MMTM_MVCNN", "mmtm_rescale_training_file_path"),
            validation=False,
            starting_mmtmindice=1,
            mmtmpositions=4,
        )

    callbacks_constructed = []
    for name in callbacks:
        ctor = getattr(avail_callbacks, name, None)
        if ctor is not None:
            callbacks_constructed.append(ctor())

    _, sample_views, _ = target_data.dataset[int(target_data.indices[0])]
    import jax.numpy as jnp

    sample = jnp.zeros((batch_size,) + sample_views.shape, jnp.float32)
    state = create_train_state(model, None, jax.random.PRNGKey(seed), sample, num_modalities=model.num_towers)

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
