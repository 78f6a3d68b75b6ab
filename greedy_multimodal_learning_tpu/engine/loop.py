"""Orchestration loops: wiring configs, callbacks, history and checkpoints.

Mirrors the reference's training_loop / evalution_loop gin surfaces and
artifact layout (reference: src/training_loop.py:86-212):

* history.csv / history.pickle in the save dir; stale files removed at
  start (proper fs ops replacing the reference's ``os.system("rm …")``,
  quirk #8),
* default callbacks: history append + save, best-val checkpoint
  (``model_best_val.pt``, monitor val_acc max), last-epoch checkpoint every
  epoch (reference: src/training_loop.py:26-50),
* the reference accidentally passes its callback list as the
  ``save_with_structure`` positional, so any custom callback enables the
  structured pickle (quirk #2) — which the analysis pipeline *requires*
  (train_indices, reference: src/balanced_mmtm.py:189-192).  Reproduced
  deliberately: training runs with custom callbacks write history.pickle,
* ``n_epochs - 1`` executed epochs (quirk #3, reference:
  src/training_loop.py:141),
* eval history under ``save_path/eval_history_batch/`` (reference:
  src/training_loop.py:145-157).

``use_gpu`` / ``device_numbers`` are accepted for gin-file compatibility and
ignored: device placement is JAX/XLA's job here.
"""

from __future__ import annotations

import logging
import os
from functools import partial

from .. import config as cfg
from .callbacks import LambdaCallback, ModelCheckpoint
from .framework import Trainer
from .history import append_to_history, save_history

logger = logging.getLogger(__name__)


def _remove_stale(paths):
    for p in paths:
        try:
            os.remove(p)
        except FileNotFoundError:
            pass


def _construct_default_callbacks(H, save_path, checkpoint_monitor, save_with_structure=False):
    callbacks = [
        LambdaCallback(on_epoch_end=partial(append_to_history, H=H)),
        LambdaCallback(
            on_epoch_end=partial(save_history, save_path=save_path, H=H, save_with_structure=save_with_structure)
        ),
        ModelCheckpoint(
            monitor=checkpoint_monitor,
            save_best_only=True,
            # hardcoded max regardless of the monitored metric's direction —
            # reference parity (src/training_loop.py:39-42); pass a custom
            # ModelCheckpoint callback for min-mode monitors.
            mode="max",
            filepath=os.path.join(save_path, "model_best_val.pt"),
        ),
    ]

    def save_weights_fnc(epoch, logs):
        logger.info("Saving model from epoch %s", epoch)

    callbacks.append(LambdaCallback(on_epoch_end=save_weights_fnc))
    return callbacks


def _detect_controller(custom_callbacks):
    for clbk in custom_callbacks:
        kind = getattr(clbk, "controller_kind", "none")
        if kind != "none":
            return kind, clbk.controller_config()
    return "none", {}


@cfg.configurable
def training_loop(
    model,
    optimizer,
    state,
    config,
    save_path,
    steps_per_epoch,
    train=None,
    valid=None,
    test=None,
    test_steps=None,
    validation_steps=None,
    use_gpu=False,
    device_numbers=(0,),
    custom_callbacks=(),
    checkpoint_monitor="val_acc",
    n_epochs=100,
    verbose=True,
    nummodalities=2,
    resume=False,
    data_parallel=False,
    model_parallel=1,
    orbax_dir=None,
    orbax_max_to_keep=2,
    checkpoint_every=1,
    fold_bn_eval=False,
):
    callbacks = list(custom_callbacks)
    os.makedirs(save_path, exist_ok=True)

    history_csv_path = os.path.join(save_path, "history.csv")
    history_pkl_path = os.path.join(save_path, "history.pkl")
    last_ckpt = os.path.join(save_path, "model_last_epoch.pt")
    resuming = bool(resume) and os.path.exists(last_ckpt) and os.path.exists(history_csv_path)

    H = {}
    initial_epoch = 1
    if resuming:
        # New capability vs the reference (which always restarts and wipes
        # history, SURVEY §5): reload history and continue from the epoch
        # after the last completed one.  The structured pickle (when the
        # run writes one) is preferred over the CSV: it also restores the
        # non-scalar keys (train_indices, squeeze-map arrays) so the
        # post-resume history.pickle stays epoch-aligned for the analysis
        # pipeline instead of restarting those lists empty.
        history_pickle_path = os.path.join(save_path, "history.pickle")
        if os.path.exists(history_pickle_path):
            import pickle

            with open(history_pickle_path, "rb") as f:
                H.update(pickle.load(f))
        else:
            import pandas as pd

            df = pd.read_csv(history_csv_path)
            for col in df.columns:
                H[col] = df[col].tolist()
        initial_epoch = int(H["epoch"][-1]) + 1
        logger.info("Resuming from %s at epoch %d", last_ckpt, initial_epoch)
    else:
        # Removes "history.pkl" while save_history writes "history.pickle"
        # — the reference's own filename mismatch, kept deliberately
        # (src/training_loop.py:100-105 vs :65-67): a stale structured
        # pickle from a prior run survives exactly as it does there.
        logger.info("Removing %s and %s", history_pkl_path, history_csv_path)
        _remove_stale([history_pkl_path, history_csv_path])
    # quirk #2 reproduced: structured pickle iff custom callbacks present.
    # Empty val split in a TRAINING run: the reference crashes (0/0 over
    # zero batches); a silent rebuild alternative would monitor a constant
    # val_acc=0.0 and keep the first epoch's checkpoint forever.  Warn
    # loudly and drop the best-val checkpoint instead (PARITY.md
    # deliberate departures; valid_size=0 is meant for recording evals,
    # reference: configs/recording.gin:18).
    empty_val = not validation_steps or (valid is not None and len(valid) == 0)
    if empty_val and checkpoint_monitor.startswith("val"):
        logger.warning(
            "Empty validation split (validation_steps=%s): %s would be a "
            "constant 0.0 — best-val checkpointing DISABLED for this run; "
            "only model_last_epoch.pt will be written. Set valid_size>0 "
            "for checkpoint selection.",
            validation_steps, checkpoint_monitor,
        )
    defaults = _construct_default_callbacks(
        H, save_path, checkpoint_monitor, save_with_structure=bool(custom_callbacks)
    )
    if empty_val and checkpoint_monitor.startswith("val"):
        defaults = [c for c in defaults if not isinstance(c, ModelCheckpoint)]
    callbacks += defaults

    kind, ctrl_cfg = _detect_controller(custom_callbacks)

    # GSPMD scale-out (BASELINE config 5): shard over all visible devices.
    mesh = None
    if data_parallel:
        import jax

        from ..parallel import make_mesh

        mesh = make_mesh(jax.devices(), model_parallel=int(model_parallel))
        logger.info("Data-parallel mesh: %s", dict(mesh.shape))
        from ..data.pipeline import adopt_mesh_for_cache

        adopt_mesh_for_cache([p for p in (train, valid, test) if p is not None], mesh)

    trainer = Trainer(
        model=model,
        optimizer=optimizer,
        state=state,
        controller_kind=kind,
        controller_config=ctrl_cfg,
        metrics_names=["acc"],
        nummodalities=nummodalities,
        verbose=verbose,
        mesh=mesh,
        fold_bn_eval=fold_bn_eval,
    )

    for clbk in callbacks:
        clbk.set_save_path(save_path)
        clbk.set_model(trainer, ignore=False)
        clbk.set_optimizer(optimizer)
        clbk.set_config(config)
        clbk.set_model_pytoune(trainer)

    if resuming:
        from . import checkpoint as ckpt_mod

        trainer.state = ckpt_mod.load_into_state(trainer.state, last_ckpt, full_restore=True)
        trainer._skip_next_controller_reset = True

    # Optional orbax async full-state snapshots (production backend).
    # Restore happens here — before the resume fixup below — because an
    # orbax snapshot (saved every epoch) supersedes the .pt sidecar (saved
    # every checkpoint_every epochs).
    orbax = None
    if orbax_dir:
        from .checkpoint import OrbaxCheckpointer

        orbax = OrbaxCheckpointer(
            orbax_dir if os.path.isabs(orbax_dir) else os.path.join(save_path, orbax_dir),
            max_to_keep=int(orbax_max_to_keep),
        )
        if resuming and orbax.latest_step() is not None:
            trainer.state, restored_step = orbax.restore_latest(trainer.state)
            logger.info("Restored orbax snapshot at epoch %s", restored_step)
        callbacks.append(LambdaCallback(on_epoch_end=lambda epoch, logs: orbax.save(epoch, trainer.state)))

    if resuming:
        import jax

        # With checkpoint_every > 1 the sidecar can be OLDER than
        # history.csv (history is written every epoch, the checkpoint every
        # checkpoint_every epochs).  The restored weights are authoritative:
        # derive their epoch from the restored step counter and truncate the
        # replayed history to it, so scheduler/stopping/best state and the
        # epoch numbering match the weights actually resumed.
        ckpt_epoch = int(jax.device_get(trainer.state.step)) // max(int(steps_per_epoch), 1)
        if H.get("epoch") and ckpt_epoch < int(H["epoch"][-1]):
            logger.info(
                "Checkpoint is at epoch %d but history reaches epoch %d "
                "(checkpoint_every=%s): truncating history to the checkpoint",
                ckpt_epoch, int(H["epoch"][-1]), checkpoint_every,
            )
            keep = sum(1 for e in H["epoch"] if int(e) <= ckpt_epoch)
            for key in list(H):
                del H[key][keep:]
        initial_epoch = (int(H["epoch"][-1]) if H.get("epoch") else ckpt_epoch) + 1
        if checkpoint_monitor in H and H[checkpoint_monitor]:
            for clbk in callbacks:
                if isinstance(clbk, ModelCheckpoint) and clbk.save_best_only:
                    clbk.best = max(H[checkpoint_monitor])
        # Replay host-side scheduler/stopping state from history so resumed
        # trajectories match uninterrupted ones exactly.
        for clbk in callbacks:
            metric = getattr(clbk, "metric", getattr(clbk, "monitor", None))
            if hasattr(clbk, "replay") and metric in H:
                clbk.replay(H[metric])

    # last-epoch checkpoint (reference saves every epoch,
    # src/training_loop.py:44-48 — checkpoint_every=1 default preserves
    # that; raise it to amortize D2H cost on slow links)
    callbacks.append(
        LambdaCallback(
            on_epoch_end=lambda epoch, logs: (
                trainer.save_weights(os.path.join(save_path, "model_last_epoch.pt"))
                if epoch % max(int(checkpoint_every), 1) == 0
                else None
            )
        )
    )

    trainer.train_loop(
        train,
        valid_generator=valid,
        test_generator=test,
        test_steps=test_steps,
        validation_steps=validation_steps,
        steps_per_epoch=steps_per_epoch,
        epochs=n_epochs - 1,  # quirk #3 (reference: src/training_loop.py:141)
        callbacks=callbacks,
        initial_epoch=initial_epoch,
    )
    if orbax is not None:
        orbax.wait()
    return trainer


def _construct_default_eval_callbacks(H, save_path, save_with_structure):
    history_batch = os.path.join(save_path, "eval_history_batch")
    os.makedirs(history_batch, exist_ok=True)
    return [
        LambdaCallback(on_epoch_end=partial(append_to_history, H=H)),
        LambdaCallback(
            on_epoch_end=partial(
                save_history, save_path=history_batch, H=H, save_with_structure=save_with_structure
            )
        ),
    ]


@cfg.configurable
def evalution_loop(  # [sic] reference name kept for gin compatibility (quirk #9)
    model,
    state,
    config,
    save_path,
    test=None,
    test_steps=None,
    use_gpu=False,
    device_numbers=(0,),
    custom_callbacks=(),
    pretrained_weights_path=None,
    save_with_structure=False,
    nummodalities=2,
    average_squeezemaps=None,
    mmtm_off=False,
    data_parallel=False,
    model_parallel=1,
    fold_bn_eval=False,
    ondevice_rescale=False,
    ondevice_rescale_training_path=None,
    ondevice_rescale_validation=False,
):
    # GSPMD scale-out for eval (mirrors training_loop's data_parallel).
    mesh = None
    if data_parallel:
        import jax

        from ..parallel import make_mesh

        mesh = make_mesh(jax.devices(), model_parallel=int(model_parallel))
        logger.info("Eval data-parallel mesh: %s", dict(mesh.shape))
        from ..data.pipeline import adopt_mesh_for_cache

        adopt_mesh_for_cache([test] if test is not None else [], mesh)

    trainer = Trainer(
        model=model,
        optimizer=None,
        state=state,
        metrics_names=["acc"],
        nummodalities=nummodalities,
        average_squeezemaps=average_squeezemaps,
        mmtm_off=mmtm_off,
        mesh=mesh,
        fold_bn_eval=fold_bn_eval,
    )
    trainer.load_weights(pretrained_weights_path)

    if ondevice_rescale:
        # Recording-pass fast path (optional; the history.pickle interchange
        # stays the default): reduce the squeeze maps to per-(module, view)
        # means over the training run's train (or val) indices ON DEVICE —
        # KBs cross the link instead of the multi-MB per-sample payload.
        # The training run's history.pickle conventionally lives in this
        # same save_path (the recording pass runs inside the training dir).
        import pickle as _pickle

        import numpy as _np

        from ..analysis.ondevice_rescale import RescaleMeanAccumulator

        tpath = ondevice_rescale_training_path or save_path
        with open(os.path.join(tpath, "history.pickle"), "rb") as f:
            training_history = _pickle.load(f)
        selected = _np.asarray(
            training_history["val_indices"][0]
            if ondevice_rescale_validation
            else training_history["train_indices"][0]
        )
        trainer.rescale_accumulator = RescaleMeanAccumulator(
            selected, trainer._eval_step.record_pack_spec
        )

    os.makedirs(save_path, exist_ok=True)
    history_csv_path = os.path.join(save_path, "eval_history.csv")
    history_pkl_path = os.path.join(save_path, "eval_history.pkl")
    logger.info("Removing %s and %s", history_pkl_path, history_csv_path)
    from ..analysis.ondevice_rescale import RESCALE_MEANS_FILENAME

    # also drop any stale on-device means file: a leftover blob from a
    # previous recording must never shadow this pass's fresh payload
    _remove_stale([
        history_pkl_path,
        history_csv_path,
        os.path.join(save_path, "eval_history_batch", RESCALE_MEANS_FILENAME),
    ])

    H = {}
    callbacks = list(custom_callbacks)
    callbacks += _construct_default_eval_callbacks(H, save_path, save_with_structure)

    for clbk in callbacks:
        clbk.set_save_path(save_path)
        clbk.set_model(trainer, ignore=False)
        clbk.set_config(config)
        clbk.set_model_pytoune(trainer)

    trainer.eval_loop(test, epochs=0, test_steps=test_steps, callbacks=callbacks)

    if ondevice_rescale and trainer.rescale_accumulator is not None:
        import pickle as _pickle

        from ..analysis.ondevice_rescale import RESCALE_MEANS_FILENAME

        means, count = trainer.rescale_accumulator.means()
        outdir = os.path.join(save_path, "eval_history_batch")
        os.makedirs(outdir, exist_ok=True)
        out_path = os.path.join(outdir, RESCALE_MEANS_FILENAME)
        with open(out_path, "wb") as f:
            _pickle.dump(
                {
                    "key": "test_squeezedmaps_array_list",
                    "validation": bool(ondevice_rescale_validation),
                    "means": means,
                    "count": count,
                    # identity: the exact index set the means were averaged
                    # over — get_rescale_weights re-derives its selection
                    # from ITS training_save_path and only takes the fast
                    # path when the sets match
                    "selected": _np.asarray(selected, _np.int64),
                },
                f,
            )
        logger.info(
            "on-device rescale means written to %s (%d member samples)",
            out_path, count,
        )
    return trainer
