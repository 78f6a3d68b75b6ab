#!/usr/bin/env python3
"""Trainer entry point — CLI surface preserved verbatim from the reference
(reference: train.py, README.md:14-18):

    python3 train.py SAVE_PATH CONFIG.gin [BINDINGS]

Config files are '#'-separable mixins; bindings are '#'-separated
``Name.param=value`` lines.
"""

import logging

import jax

logger = logging.getLogger(__name__)

from greedy_multimodal_learning_tpu import config as cfg
from greedy_multimodal_learning_tpu.bootstrap import build_model_and_loaders, init_state
from greedy_multimodal_learning_tpu.engine import callbacks as avail_callbacks
from greedy_multimodal_learning_tpu.engine import make_optimizer, training_loop
from greedy_multimodal_learning_tpu.parallel import maybe_initialize_distributed
from greedy_multimodal_learning_tpu.utils import gin_wrap

maybe_initialize_distributed()


@cfg.configurable
def train(save_path, wd=0.0, lr=0.1, momentum=0.0, batch_size=8, callbacks=(), seed=777, model="MMTM_MVCNN"):
    """Build model/data/optimizer and run the training loop
    (reference: train.py:43-70).

    ``model`` selects the family: 'MMTM_MVCNN' (ModelNet40 multiview,
    the reference's model) or 'MMTM_3DCNN' (NVGesture-style 3-modality
    3D-CNN, BASELINE config 4)."""
    model, (train_loader, valid_loader, test_loader) = build_model_and_loaders(model, batch_size)

    optimizer = make_optimizer(lr=lr, momentum=momentum, weight_decay=wd)

    # Callbacks constructed by name lookup over this module's namespace,
    # mirroring the reference's module-dict dispatch (reference:
    # train.py:54-57).  DELIBERATE DEPARTURE (PARITY.md): the reference's
    # `if name in avail_callbacks.__dict__` *silently skips* unknown names;
    # here a typo'd controller name fails loudly instead of silently
    # turning the run into a different experiment arm.
    callbacks_constructed = []
    for name in callbacks:
        ctor = getattr(avail_callbacks, name, None)
        if ctor is None:
            raise KeyError(f"Unknown callback {name!r} in train.callbacks")
        callbacks_constructed.append(ctor())

    state = init_state(model, train_loader, batch_size, seed, optimizer=optimizer)

    # MMTM_MVCNN.pretraining=True: merge local torchvision ImageNet trunks
    # into every tower (reference: src/model.py:53-56 pulls them remotely).
    from greedy_multimodal_learning_tpu.models import apply_pretrained_trunks, resolve_pretrained_path

    pretrained_path = resolve_pretrained_path()
    if pretrained_path:
        state = apply_pretrained_trunks(state, pretrained_path, model.num_towers)

    training_loop(
        model=model,
        optimizer=optimizer,
        state=state,
        train=train_loader,
        valid=valid_loader,
        test=test_loader,
        steps_per_epoch=len(train_loader),
        validation_steps=len(valid_loader),
        test_steps=len(test_loader),
        save_path=save_path,
        config=cfg.CONFIG,
        custom_callbacks=callbacks_constructed,
        nummodalities=model.num_towers,
    )


if __name__ == "__main__":
    gin_wrap(train)
