"""Shared entry-point bootstrap: model family + loaders + initial state.

The three CLI entries (train.py / eval.py / predict.py) all build the same
(model, loaders, TrainState) triple from the gin config; this module keeps
that logic in one place (the reference duplicates it across train.py:43-57
and eval.py:23-47)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .engine import create_train_state


def build_model_and_loaders(model_name: str, batch_size: int):
    """Model-family dispatch (reference: train.py:43-46 / eval.py:39-47):
    'MMTM_MVCNN' (ModelNet40 multiview) or 'MMTM_3DCNN' (3-modality 3D-CNN,
    BASELINE config 4).  Returns (model, (train, val, test) loaders)."""
    if model_name == "MMTM_3DCNN":
        from .data.nvgesture import get_nvgesturedata
        from .models import build_3dcnn_from_config

        return build_3dcnn_from_config(), get_nvgesturedata(batch_size=batch_size)
    from .data import get_mvdcndata
    from .models import build_model_from_config

    return build_model_from_config(), get_mvdcndata(batch_size=batch_size)


def select_split(loaders, name: str):
    """train/val/test loader choice (reference: eval.py:34-41)."""
    train_loader, val_loader, test_loader = loaders
    table = {"train": train_loader, "val": val_loader, "test": test_loader}
    if name not in table:
        raise ValueError(f"target_data_split must be one of {sorted(table)}, got {name!r}")
    return table[name]


def init_state(model, loader, batch_size: int, seed: int, optimizer=None, controller_seed=None):
    """Shape-probe one sample and initialize the TrainState."""
    _, sample_views, _ = loader.dataset[int(loader.indices[0])]
    sample = jnp.zeros((batch_size,) + sample_views.shape, jnp.float32)
    return create_train_state(
        model,
        optimizer,
        jax.random.PRNGKey(seed),
        sample,
        num_modalities=model.num_towers,
        controller_seed=seed if controller_seed is None else controller_seed,
    )
