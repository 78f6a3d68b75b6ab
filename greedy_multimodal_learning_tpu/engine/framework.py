"""Trainer: the host-side engine around the jitted steps.

Role-equivalent to the reference's poutyne-style ``Model_`` wrapper
(reference: src/framework.py:125-345) — epoch loop with per-epoch train →
val → test passes, size-weighted metric accumulation, callback hook fan-out,
NaN-loss stop — but redesigned for an async device pipeline:

* the step is one donated jit call; the host never reads a device value in
  the hot loop (progress rendering is throttled and reads lazily),
* per-step outputs are accumulated as device scalars and fetched in a
  single ``jax.device_get`` at epoch end,
* NaN detection happens on the epoch's collected losses — the reference
  also only *breaks* after the epoch completes (it merely sets
  ``stop_training`` mid-epoch, reference: src/framework.py:321-322),
* curation flags live in the device-side controller state; callbacks flip
  host-side latches (``unlock_controller``) that enter the step as traced
  scalars.
"""

from __future__ import annotations

import itertools
import logging
import timeit
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import checkpoint as ckpt
from ..utils.pytree import bulk_device_get
from .callbacks import CallbackList, ProgressionCallback, ValidationProgressionCallback
from .controller import init_controller_state
from .steps import (
    _make_eval_core,
    build_eval_step,
    build_scanned_eval_step,
    build_train_step,
    make_controller_update,
)
from .train_state import get_learning_rate, set_learning_rate

logger = logging.getLogger(__name__)


def _cycle(iterable):
    while True:
        for x in iterable:
            yield x


def _get_step_iterator(steps, generator, prefetch_depth=2, put=None):
    count_iterator = range(1, steps + 1) if steps is not None else itertools.count(1)
    generator = _cycle(generator) if steps is not None else generator
    if prefetch_depth:
        from ..data.pipeline import device_prefetch

        generator = device_prefetch(generator, depth=prefetch_depth, put=put)
    return zip(count_iterator, generator)


class Trainer:
    def __init__(
        self,
        model,
        optimizer,
        state,
        *,
        controller_kind: str = "none",
        controller_config: Optional[dict] = None,
        metrics_names: List[str] = ("acc",),
        nummodalities: int = 2,
        verbose: bool = True,
        average_squeezemaps=None,
        mmtm_off: bool = False,
        jit: bool = True,
        mesh=None,
        model_parallel_min_dim: int = 256,
        fold_bn_eval: bool = False,
    ):
        self.model = model
        self.optimizer = optimizer
        self.state = state
        # GSPMD scale-out: shard the state over the mesh; batches are
        # sharded on the data axis at prefetch time (parallel/mesh.py).
        self.mesh = mesh
        if mesh is not None:
            from ..parallel import shard_batch, shard_train_state
            from ..parallel.multihost import global_batch_from_local

            self.state = shard_train_state(self.state, mesh, model_parallel_min_dim)
            if jax.process_count() > 1:
                # multi-host: every process feeds its local rows of the
                # global batch; leaves become globally-sharded jax.Arrays
                self._put = lambda b: global_batch_from_local(b, mesh)
            else:
                self._put = lambda b: shard_batch(b, mesh)
        else:
            self._put = None
        self.metrics_names = list(metrics_names)
        self.nummodalities = nummodalities
        self.verbose = verbose
        self.stop_training = False
        self.controller_kind = controller_kind
        self.controller_config = controller_config or {}
        self._unlock = False
        self.average_squeezemaps = average_squeezemaps
        self.mmtm_off = mmtm_off
        # BN-folded inference: eval passes run with running stats
        # (use_running_average — reference: src/framework.py:232-237), where
        # the BN affine folds exactly into the preceding conv kernel
        # (engine/fold_bn.py), removing the eval forward's BN map sweeps
        # (~31% of step HBM traffic per the PERF.md roofline).  Folded
        # (params, batch_stats) are computed once per eval pass in ONE
        # jitted dispatch and swapped in for the pass only; training always
        # sees the unfolded state.
        self.fold_bn_eval = fold_bn_eval
        self._fold_cache = None  # (params_ref, stats_ref, folded_p, folded_s)
        self._fold_fn = None
        # Optional on-device rescale-weight reduction (analysis/
        # ondevice_rescale.py): when set, recording payloads are reduced to
        # per-(module, view) means on device and NEVER fetched per sample.
        self.rescale_accumulator = None

        branchnames = self.controller_config.get(
            "branchnames", [f"net_view_{i}" for i in range(nummodalities)]
        )
        mmtm_names = self.controller_config.get("mmtm_names", None)
        if not mmtm_names:
            mmtm_names = list(getattr(model, "modality_names", [f"modal_{i}" for i in range(nummodalities)]))
        from .bdr import GroupReducer

        group_matrix = GroupReducer(state.params, branchnames, mmtm_names)
        if controller_kind in ("guided", "weakest", "adaptive_weakest"):
            # An empty parameter group (typo'd branch/modality name, or a
            # model whose tower names don't match) would make the BDR ratio
            # 0/0 = NaN — silently disabling curation (guided) or poisoning
            # the d_BDR telemetry (weakest) for the whole run — fail loudly.
            col_counts = group_matrix.matrix.sum(axis=0)
            if (col_counts == 0).any():
                names = [f"main:{b}" for b in branchnames] + [f"bypass:{m}" for m in mmtm_names]
                empty = [names[i] for i in np.flatnonzero(col_counts == 0)]
                raise ValueError(
                    f"{controller_kind} controller: no parameters matched group(s) {empty}; "
                    f"check branchnames/mmtm_names against the parameter tree"
                )
        ctrl_update = make_controller_update(controller_kind, nummodalities, **{
            k: v
            for k, v in self.controller_config.items()
            if k in ("epsilon", "curation_windowsize", "duty_period")
        })
        self._train_step = build_train_step(model, optimizer, group_matrix, ctrl_update, jit=jit) if optimizer is not None else None
        eval_core = _make_eval_core(model, mmtm_off)
        self._eval_step = build_eval_step(model, mmtm_off=mmtm_off, jit=jit, core_and_spec=eval_core)
        # Scanned eval: K steps per dispatch (single-device jitted runs
        # only — stacked-batch shardings are undefined under a mesh).
        self.eval_scan_size = 10
        self._eval_scan_step = (
            build_scanned_eval_step(model, mmtm_off=mmtm_off, jit=True, core_and_spec=eval_core)
            if (jit and mesh is None)
            else None
        )
        # Optional profiling (SURVEY §5: the reference has only wall-clock
        # timers; here a jax.profiler trace can be captured per run).
        self.profile_dir = None
        self._profiling = False

    def enable_profiling(self, trace_dir: str):
        self.profile_dir = trace_dir

    # --- handles used by callbacks (mirroring model_pytoune attributes) ---

    def reset_controller(self):
        if getattr(self, "_skip_next_controller_reset", False):
            # resume path: controller state was just restored from the
            # sidecar; the train-begin reset must not wipe it.
            self._skip_next_controller_reset = False
            return
        n = self.state.controller.M_main.shape[0]
        fresh = init_controller_state(n)
        # Keep the carried PRNG key: init_controller_state would reseed it
        # to key 0, making every random-ablation run draw the identical
        # curation sequence regardless of the configured controller_seed.
        fresh = fresh.replace(rng=self.state.controller.rng)
        self.state = self.state.replace(controller=fresh)
        self._unlock = False

    def unlock_controller(self):
        self._unlock = True

    def set_controller_target(self, modality: int):
        """Host-designated curation target (weakest controller): written
        into ``caring_modality``, which :func:`~.controller.weakest_update`
        preserves across steps.  -1 means no target designated yet."""
        ctrl = self.state.controller
        self.state = self.state.replace(
            controller=ctrl.replace(
                caring_modality=jnp.asarray(int(modality), jnp.int32)
            )
        )

    def get_lr(self):
        return get_learning_rate(self.state)

    def set_lr(self, lr):
        self.state = set_learning_rate(self.state, lr)

    def save_weights(self, filepath):
        ckpt.save_weights(self.state, filepath)

    def load_weights(self, filepath):
        self.state = ckpt.load_into_state(self.state, filepath)

    # --- epoch loops ---

    def _train_epoch(self, generator, steps_per_epoch, callback_list):
        records = []
        unlock = jnp.asarray(self._unlock)
        if self.profile_dir and not self._profiling:
            jax.profiler.start_trace(self.profile_dir)
            self._profiling = True
        for batch_ind, batch in _get_step_iterator(steps_per_epoch, generator, put=self._put):
            batch_begin_time = timeit.default_timer()
            callback_list.on_batch_begin(batch_ind, {})
            callback_list.on_forward_begin(batch_ind, batch)
            size = batch.pop("size")
            indices = batch.pop("indices")
            self.state, out = self._train_step(self.state, batch, unlock)
            callback_list.on_backward_end(batch_ind)
            records.append(
                {"out": out, "size": size, "indices": np.asarray(indices)[:size], "t0": batch_begin_time}
            )
            batch_logs = {
                "batch": batch_ind,
                "size": size,
                "time": timeit.default_timer() - batch_begin_time,
                "batch_begin_time": batch_begin_time,
                "loss": out["loss"],
                "acc": out["acc"],
                "d_BDR": out["d_BDR"],
                "curation_mode": out["curation_mode"],
                "caring_modality": out["caring_modality"],
            }
            for i in range(self.nummodalities):
                batch_logs[f"acc_modal_{i}"] = out["acc_modal"][i]
            callback_list.on_batch_end(batch_ind, batch_logs)

        if self._profiling:
            # one traced epoch per enable_profiling() call
            jax.block_until_ready(records[-1]["out"]["loss"] if records else None)
            jax.profiler.stop_trace()
            self._profiling = False
            self.profile_dir = None

        # One synchronization point for the whole epoch.
        outs = bulk_device_get([r["out"] for r in records])
        sizes = np.array([r["size"] for r in records], np.float64)
        losses = np.array([o["loss"] for o in outs], np.float64)
        total = sizes.sum()
        train_dict = {
            "loss": float((losses * sizes).sum() / total),
            "train_indices": np.concatenate([r["indices"] for r in records]) if records else [],
            "acc": float((np.array([o["acc"] for o in outs]) * sizes).sum() / total),
            "_num_samples": float(total),
        }
        for i in range(self.nummodalities):
            vals = np.array([o["acc_modal"][i] for o in outs])
            train_dict[f"acc_modal_{i}"] = float((vals * sizes).sum() / total)
        # Recording extras during training (reference records scales/squeeze
        # maps whenever the model's saving flags are on,
        # src/framework.py:158-161; prefixed train_* in the epoch log).
        for key in ("mmtmscales_list", "squeezedmaps_array_list"):
            if records and key in outs[0]:
                per_batch = []
                for rec, o in zip(records, outs):
                    sz = int(rec["size"])
                    per_batch.append([[np.asarray(v)[:sz] for v in mmtm] for mmtm in o[key]])
                train_dict[f"train_{key}"] = per_batch
        if np.isnan(losses).any():
            self.stop_training = True
        return train_dict

    def _folded_params_stats(self):
        """Folded (params, batch_stats) for the CURRENT state, cached by
        object identity (the cache holds a reference to the keyed trees, so
        an id() can never be recycled into a false hit).  One jitted
        dispatch per fold; None on failure (folding then stays off)."""
        params, stats = self.state.params, self.state.batch_stats
        if (
            self._fold_cache is not None
            and self._fold_cache[0] is params
            and self._fold_cache[1] is stats
        ):
            return self._fold_cache[2], self._fold_cache[3]
        from .fold_bn import fold_batchnorm

        if self._fold_fn is None:
            # jitted: the per-BN-scope arithmetic is ~240 tiny ops — one
            # dispatch instead of one per op (remote-link RPC cost, PERF.md)
            self._fold_fn = jax.jit(fold_batchnorm)
        try:
            folded_p, folded_s = self._fold_fn(params, stats)
        except Exception:
            logging.getLogger(__name__).warning(
                "BN eval fold failed; evaluating unfolded", exc_info=True
            )
            self.fold_bn_eval = False
            return None, None
        self._fold_cache = (params, stats, folded_p, folded_s)
        return folded_p, folded_s

    def _consume_records(self, out, indices_list, sizes, batch_rows):
        """On-device rescale reduction: fold this dispatch's packed recording
        buffer into the accumulator and DROP it from the outputs, so the
        per-sample payload is never fetched (analysis/ondevice_rescale.py).
        No-op unless an accumulator is installed."""
        acc = self.rescale_accumulator
        if acc is None or not isinstance(out, dict) or "packed_records" not in out:
            return
        member = np.stack(
            [
                acc.member_mask(idx, int(sz), batch_rows)
                for idx, sz in zip(indices_list, sizes)
            ]
        )
        spec = getattr(self._eval_step, "record_pack_spec", ())
        only_squeeze = all(key == "squeezedmaps_array_list" for key, *_ in spec)
        if only_squeeze:
            acc.consume(out.pop("packed_records"), member)
        else:
            # other recording payloads (e.g. saving_mmtm_scales) share the
            # packed buffer: reduce the squeeze entries but KEEP the buffer
            # so the other payloads still reach the history — no byte
            # savings in this configuration, and say so once
            if not getattr(self, "_warned_mixed_records", False):
                self._warned_mixed_records = True
                logging.getLogger(__name__).warning(
                    "ondevice_rescale with non-squeeze recording payloads "
                    "(%s): the packed buffer is still fetched so those "
                    "payloads are preserved — the D2H saving only applies "
                    "to squeeze-only recording runs",
                    sorted({key for key, *_ in spec if key != "squeezedmaps_array_list"}),
                )
            acc.consume(out["packed_records"], member)

    def _eval_generator(self, generator, phase, *, steps=None, callback_list=None):
        if generator is None or not self.fold_bn_eval:
            return self._eval_generator_inner(
                generator, phase, steps=steps, callback_list=callback_list
            )
        folded_p, folded_s = self._folded_params_stats()
        if folded_p is None:
            return self._eval_generator_inner(
                generator, phase, steps=steps, callback_list=callback_list
            )
        original = (self.state.params, self.state.batch_stats)
        self.state = self.state.replace(params=folded_p, batch_stats=folded_s)
        try:
            return self._eval_generator_inner(
                generator, phase, steps=steps, callback_list=callback_list
            )
        finally:
            # eval mutates only .mmtm/.controller; params/stats restore exact
            self.state = self.state.replace(params=original[0], batch_stats=original[1])

    def _eval_generator_inner(self, generator, phase, *, steps=None, callback_list=None):
        if generator is None:  # train-only runs: no val/test pass, no keys
            return {}
        if self.controller_kind in ("weakest", "adaptive_weakest"):
            # The guided/random controllers mirror the reference: the live
            # curation flags thread into eval forwards (src/framework.py:
            # 146-148,232-237).  The weakest extensions have no reference
            # counterpart and a duty cycle / window could otherwise end an
            # epoch mid-curation, so the per-modality val metrics — the
            # argmin and gap the next designation reads — would be measured
            # with the cared gate averaged.  Evaluate with curation off;
            # the next train step recomputes the mode (weakest: from the
            # duty phase; adaptive: a fresh window entry while the host
            # gate stays open).
            ctrl = self.state.controller
            # unconditional replace: a host->device scalar is async, while
            # inspecting the flag first would block on a device fetch
            self.state = self.state.replace(
                controller=ctrl.replace(curation_mode=jnp.asarray(False))
            )
        if steps is None:
            steps = len(generator)
        progress = ValidationProgressionCallback(
            phase=phase, steps=steps, metrics_names=["loss"] + self.metrics_names
        )
        progress.set_model_pytoune(self)
        records = []
        avg_maps = self.average_squeezemaps
        # Phase attribution (data-wait / dispatch / render) logged at debug
        # level: on remote backends a slow eval loop is usually one of these
        # three and the split identifies which without a profiler.
        t_data = t_dispatch = t_render = t_first_dispatch = 0.0
        # Scanned groups: K steps per dispatch (one link round trip and one
        # H2D upload per group — PERF.md).  The steps%K tail runs through
        # the per-step program, so no padded forwards ever touch the MMTM
        # running-average chain (quirk #6 semantics are exact).
        K = self.eval_scan_size if self._eval_scan_step is not None else 0
        use_scan = bool(K) and steps >= 2 * K
        # NOTE: no per-step copy_to_host_async anywhere here — on the
        # remote backend it queues one slow per-buffer transfer per step
        # and the final bulk fetch then waits behind the whole queue
        # (measured 680 s for 150 x 57 KB).  The chunked pack in
        # bulk_device_get moves the same data in a handful of RPCs.
        pending = []  # host batches awaiting a full scan group

        def flush_pending():
            nonlocal t_first_dispatch
            if not pending:
                return
            t0 = timeit.default_timer()
            if len(pending) == K:
                # Device-cached pipelines yield committed device arrays:
                # stack those with jnp (a device op) — np.stack would pull
                # every batch back to the host through __array__.
                stack = (
                    jnp.stack
                    if isinstance(pending[0]["batch"]["images"], jax.Array)
                    else np.stack
                )
                stacked = {
                    key: stack([p["batch"][key] for p in pending])
                    for key in pending[0]["batch"]
                }
                new_mmtm, outs = self._eval_scan_step(self.state, stacked, avg_maps)
                self.state = self.state.replace(mmtm=new_mmtm)
                self._consume_records(
                    outs,
                    [p["indices"] for p in pending],
                    [p["size"] for p in pending],
                    pending[0]["batch"]["mask"].shape[0],
                )
                records.append(
                    {
                        "out": outs,
                        "scan": len(pending),
                        "size": [p["size"] for p in pending],
                        "indices": [p["indices"] for p in pending],
                    }
                )
            else:
                # ragged tail (steps % K): per-step program, so only ONE
                # scan length is ever compiled
                for p in pending:
                    new_mmtm, out = self._eval_step(self.state, p["batch"], avg_maps)
                    self.state = self.state.replace(mmtm=new_mmtm)
                    self._consume_records(
                        out, [p["indices"]], [p["size"]], p["batch"]["mask"].shape[0]
                    )
                    records.append(
                        {"out": out, "scan": 0, "size": [p["size"]], "indices": [p["indices"]]}
                    )
            if not t_first_dispatch:
                t_first_dispatch = timeit.default_timer() - t0
            pending.clear()

        t_mark = timeit.default_timer()
        step_put = (lambda x: x) if use_scan else self._put
        for batch_ind, batch in _get_step_iterator(steps, generator, put=step_put):
            batch_begin_time = timeit.default_timer()
            t_data += batch_begin_time - t_mark
            progress.on_batch_begin(batch_ind, {})
            size = batch.pop("size")
            indices = batch.pop("indices")
            entry = {"batch": batch, "size": size, "indices": np.asarray(indices)[:size]}
            batch_logs = {
                "batch": batch_ind,
                "size": size,
                "batch_begin_time": batch_begin_time,
            }
            if use_scan:
                pending.append(entry)
                if len(pending) == K or batch_ind == steps:
                    flush_pending()
            else:
                new_mmtm, out = self._eval_step(self.state, batch, avg_maps)
                self.state = self.state.replace(mmtm=new_mmtm)
                self._consume_records(
                    out, [entry["indices"]], [size], batch["mask"].shape[0]
                )
                records.append(
                    {"out": out, "scan": 0, "size": [size], "indices": [entry["indices"]]}
                )
                if not t_first_dispatch:
                    t_first_dispatch = timeit.default_timer() - batch_begin_time
                # per-step metric handles only exist on the unscanned path
                batch_logs["loss"] = out["loss"]
                batch_logs["acc"] = out["acc"]
            t_dispatch += timeit.default_timer() - batch_begin_time
            progress.on_batch_end(batch_ind, batch_logs)
            # User-callback hook per validation batch.  The reference
            # declares on_val_batch_end (src/callbacks.py:86-89,169) but
            # never invokes it; here it actually fires.
            if callback_list is not None and phase == "val":
                callback_list.on_val_batch_end(batch_ind, batch_logs)
            t_mark = timeit.default_timer()
            t_render += t_mark - batch_begin_time
        flush_pending()  # ragged tail when the generator ran short of `steps`

        t_fetch0 = timeit.default_timer()
        fetched = bulk_device_get([r["out"] for r in records])
        # Explode scan groups into per-step entries so everything below is
        # grouping-agnostic.
        outs, sizes_list, indices_list = [], [], []
        for rec, out in zip(records, fetched):
            if rec["scan"]:
                outs.extend(
                    {k: v[i] for k, v in out.items()} for i in range(rec["scan"])
                )
            else:
                outs.append(out)
            sizes_list.extend(rec["size"])
            indices_list.extend(rec["indices"])
        logger.info(
            "%s pass timing: data-wait %.1fs, dispatch %.1fs (first %.1fs), "
            "render+hooks %.1fs, final fetch %.1fs%s",
            phase, t_data, t_dispatch, t_first_dispatch,
            max(t_render - t_dispatch, 0.0), timeit.default_timer() - t_fetch0,
            f", scan groups of {K}" if use_scan else "",
        )
        sizes = np.array(sizes_list, np.float64)
        total = max(sizes.sum(), 1.0)
        losses = np.array([o["loss"] for o in outs], np.float64)

        info = {
            f"{phase}_loss": float((losses * sizes).sum() / total),
            f"{phase}_indices": np.concatenate(indices_list) if indices_list else [],
            f"{phase}_acc": float((np.array([o["acc"] for o in outs]) * sizes).sum() / total),
        }
        for i in range(self.nummodalities):
            vals = np.array([o["acc_modal"][i] for o in outs])
            info[f"{phase}_acc_modal_{i}"] = float((vals * sizes).sum() / total)

        # Unpack the in-step-packed recording payload (engine/steps.py
        # packs all scale/squeeze arrays into one flat buffer per step)
        # back into the reference's per-mmtm per-view structure.
        spec = getattr(self._eval_step, "record_pack_spec", None)
        if spec and outs and "packed_records" in outs[0]:
            for o in outs:
                flat = o.pop("packed_records")
                offset = 0
                for key, mi, vi, shape in spec:
                    n = int(np.prod(shape))
                    dest = o.setdefault(key, {})
                    dest.setdefault(mi, {})[vi] = flat[offset : offset + n].reshape(shape)
                    offset += n
                for key in ("mmtmscales_list", "squeezedmaps_array_list"):
                    if key in o:
                        o[key] = [
                            [o[key][mi][vi] for vi in sorted(o[key][mi])] for mi in sorted(o[key])
                        ]

        # Recording extras: trim padded rows, preserve the reference's
        # epoch->batch->mmtm->view nesting (src/framework.py:109-114 +
        # src/balanced_mmtm.py:157-176).
        for key in ("mmtmscales_list", "squeezedmaps_array_list"):
            if outs and key in outs[0]:
                per_batch = []
                for sz, o in zip(sizes_list, outs):
                    sz = int(sz)
                    per_batch.append([[np.asarray(v)[:sz] for v in mmtm] for mmtm in o[key]])
                info[f"{phase}_{key}"] = per_batch
        return info

    def train_loop(
        self,
        train_generator,
        test_generator=None,
        valid_generator=None,
        *,
        epochs=1000,
        steps_per_epoch=None,
        validation_steps=None,
        test_steps=None,
        callbacks=(),
        initial_epoch=1,
    ):
        callback_list = CallbackList(list(callbacks))
        if self.verbose:
            callback_list.append(ProgressionCallback())
        callback_list.set_model_pytoune(self)
        callback_list.set_params({"epochs": epochs, "steps": steps_per_epoch})

        self.stop_training = False
        callback_list.on_train_begin({})

        for epoch in range(initial_epoch, epochs + 1):
            callback_list.on_epoch_begin(epoch, {})
            epoch_begin_time = timeit.default_timer()
            if hasattr(train_generator, "set_epoch"):
                # stateless per-epoch shuffle: exact data order under resume
                train_generator.set_epoch(epoch - 1)

            train_dict = self._train_epoch(train_generator, steps_per_epoch, callback_list)
            train_time = timeit.default_timer() - epoch_begin_time
            val_dict = self._eval_generator(
                valid_generator, "val", steps=validation_steps, callback_list=callback_list
            )
            test_dict = self._eval_generator(test_generator, "test", steps=test_steps)

            epoch_log = {
                "epoch": epoch,
                "time": timeit.default_timer() - epoch_begin_time,
                "epoch_begin_time": epoch_begin_time,
                # throughput observability (new vs reference)
                "train_samples_per_sec": float(train_dict.pop("_num_samples", 0)) / max(train_time, 1e-9),
                **train_dict,
                **val_dict,
                **test_dict,
            }
            callback_list.on_epoch_end(epoch, epoch_log)
            if self.stop_training:
                break

        callback_list.on_train_end({})

    def predict(self, generator, steps=None):
        """Inference: iterate a batch pipeline and return per-sample
        predictions (new serving-oriented capability; the reference exposes
        only loss/accuracy evaluation).

        Returns dict with ``indices`` (dataset order of the inputs),
        ``predictions`` (argmax of blended logits), ``probabilities``
        (softmax of blended logits) and per-view ``logits``.
        """
        if steps is None:
            steps = len(generator)
        all_idx, all_logits = [], []
        for _, batch in _get_step_iterator(steps, generator, put=self._put):
            size = batch.pop("size")
            indices = batch.pop("indices")
            _, out = self._predict_step(self.state, batch, self.average_squeezemaps)
            all_idx.append(np.asarray(indices)[:size])
            all_logits.append([np.asarray(l)[:size] for l in out])
        logits = [np.concatenate([b[v] for b in all_logits]) for v in range(self.nummodalities)]
        blend = sum(logits) / float(self.nummodalities)
        ex = np.exp(blend - blend.max(axis=1, keepdims=True))
        return {
            "indices": np.concatenate(all_idx),
            "predictions": blend.argmax(axis=1),
            "probabilities": ex / ex.sum(axis=1, keepdims=True),
            "logits": logits,
        }

    @property
    def _predict_step(self):
        if not hasattr(self, "_predict_step_fn"):
            import jax as _jax

            from ..data.transforms import preprocess as _pre

            model = self.model
            mmtm_off = self.mmtm_off

            def fn(state, batch, average_squeezemaps):
                # Same network configuration as the eval step: an ablation
                # Trainer (mmtm_off / average squeeze maps) must predict
                # through the identical graph its metrics come from.
                x = _pre(batch["images"], train=False, dtype=model.dtype)
                (blend, logits, _, _), mut = model.apply(
                    {"params": state.params, "batch_stats": state.batch_stats, "mmtm": state.mmtm},
                    x,
                    train=False,
                    valid_mask=batch["mask"],
                    mmtm_off=mmtm_off,
                    average_squeezemaps=average_squeezemaps,
                    mutable=["mmtm"],
                )
                return mut["mmtm"], logits

            self._predict_step_fn = _jax.jit(fn)
        return self._predict_step_fn

    def eval_loop(self, test_generator, *, test_steps=None, epochs=1, callbacks=()):
        """One-or-more eval passes (reference: src/framework.py:252-268;
        note epochs=0 still runs one pass via ``while epoch <= epochs``)."""
        callback_list = CallbackList(list(callbacks))
        callback_list.set_model_pytoune(self)
        callback_list.on_train_begin({})
        epoch = 0
        while epoch <= epochs:
            epoch_begin_time = timeit.default_timer()
            callback_list.on_epoch_begin(epoch, {})
            test_dict = self._eval_generator(test_generator, "test", steps=test_steps)
            test_dict["epoch"] = epoch
            test_dict["time"] = timeit.default_timer() - epoch_begin_time
            test_dict["epoch_begin_time"] = epoch_begin_time
            callback_list.on_epoch_end(epoch, test_dict)
            epoch += 1
