"""Package-level entry functions behind the ``train.py`` / ``eval.py`` CLIs.

The reference ships these only as top-level scripts (reference: train.py:43-70,
eval.py:23-58); here the configurable functions live in the package so they can
be driven programmatically (``run_api.run_entry``) as well as from the CLI —
experiment drivers chain train → recording → flow-off phases in ONE process,
paying interpreter start, jax import, and remote-backend initialization once
per suite instead of once per phase (each phase still re-traces and re-uploads
its corpus; compiles are amortized by the persistent compilation cache — see
run_api.py for the exact warm/cold breakdown).
"""

import logging

logger = logging.getLogger(__name__)

from . import config as cfg
from .analysis import get_rescale_weights
from .bootstrap import build_model_and_loaders, init_state, select_split
from .engine import callbacks as avail_callbacks
from .engine import evalution_loop, make_optimizer, training_loop


def _set_matmul_precision(precision):
    """Pin JAX's default matmul/conv precision for this process.

    On TPU the backend default rounds matmul inputs to bf16 on the MXU
    (f32 accumulate).  ``'highest'`` multiplies in full f32 — the
    like-for-like setting against f32 CPU/GPU implementations (the
    reference trains in stock torch f32, reference: src/model.py:53-60).
    Measured effect on trained endpoints: results/parity/precision_ab.json;
    PARITY_RUN.md §2."""
    if precision:
        import jax

        jax.config.update("jax_default_matmul_precision", precision)


@cfg.configurable
def train(save_path, wd=0.0, lr=0.1, momentum=0.0, batch_size=8, callbacks=(), seed=777, model="MMTM_MVCNN",
          matmul_precision=None):
    """Build model/data/optimizer and run the training loop
    (reference: train.py:43-70).

    ``model`` selects the family: 'MMTM_MVCNN' (ModelNet40 multiview,
    the reference's model) or 'MMTM_3DCNN' (NVGesture-style 3-modality
    3D-CNN, BASELINE config 4).  ``matmul_precision`` optionally pins
    ``jax_default_matmul_precision`` ('highest' = parity-grade f32)."""
    _set_matmul_precision(matmul_precision)
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
    from .models import apply_pretrained_trunks, resolve_pretrained_path

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


@cfg.configurable
def eval_(
    save_path,
    target_data_split="test",
    pretrained_weights_path=None,
    batch_size=128,
    callbacks=(),
    seed=777,
    model="MMTM_MVCNN",
    matmul_precision=None,
):
    """Evaluate a checkpoint on a data split (reference: eval.py:23-58).

    With ``MMTM_MVCNN.mmtm_off=True`` the dataset-average squeeze maps are
    loaded via the analysis pipeline (reference: src/model.py:39-48) and the
    cross-modal flow is cut during the forward pass."""
    _set_matmul_precision(matmul_precision)
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

    from .models import apply_pretrained_trunks, resolve_pretrained_path

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
