"""Jitted train / eval steps — the big re-architecture point.

The reference's hot loop is host-driven: H2D per batch, backward, a host
callback that walks all parameters (~120 `.item()` syncs), optimizer step
(reference: src/framework.py:306-322 + src/callbacks.py:199-233).  Here one
jitted, donated step consumes a uint8 host batch and performs on device:

  preprocess (normalize + per-(sample,view) random flip)
  → N-tower forward with MMTM fusion (curation flags are traced scalars
    carried in the controller state decided by the *previous* step,
    mirroring the reference's decide-after-backward/apply-next-forward
    timing, src/framework.py:313-315)
  → blend loss + masked metrics
  → backward
  → masked group reductions for BDR statistics (engine/bdr.py)
  → SGD update
  → controller state transition (engine/controller.py)

Only a handful of scalars ever leave the device, and the host never blocks
the pipeline (the loop reads step outputs lazily).

Eval steps mirror the reference's eval semantics: BN uses running stats and
does not update; MMTM running averages *do* update (quirk #6, reference:
src/balanced_mmtm.py:113-116); the curation flags left by training apply
(the reference threads the live ``model_pytoune.curation_mode`` into eval
forwards, src/framework.py:146-148,232-237).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..data.transforms import preprocess
from .bdr import group_sq_norms
from .controller import adaptive_weakest_update, guided_update, null_update, random_update, weakest_update
from .metrics import blend_and_per_view_acc, blend_loss


def make_controller_update(kind: str, num_modalities: int, **kwargs) -> Callable:
    if kind == "guided":
        return functools.partial(
            guided_update,
            epsilon=kwargs["epsilon"],
            curation_windowsize=kwargs["curation_windowsize"],
        )
    if kind == "random":
        return functools.partial(random_update, num_modalities=num_modalities)
    if kind == "weakest":
        return functools.partial(
            weakest_update,
            curation_windowsize=kwargs["curation_windowsize"],
            duty_period=kwargs["duty_period"],
        )
    if kind == "adaptive_weakest":
        return functools.partial(
            adaptive_weakest_update,
            curation_windowsize=kwargs["curation_windowsize"],
        )
    return null_update


def build_train_step(
    model,
    optimizer,
    group_matrix,
    controller_update: Callable,
    *,
    donate: bool = True,
    jit: bool = True,
):
    """Returns step(state, batch, unlock) -> (state, out_scalars).

    ``group_matrix`` is either an (L, 2N) matrix (slow per-leaf reduction)
    or a callable :class:`~..engine.bdr.GroupReducer` (fused fast path).
    """
    if callable(group_matrix):
        reduce_groups = group_matrix
    else:
        gm = jnp.asarray(group_matrix)
        reduce_groups = lambda tree: group_sq_norms(tree, gm)

    def train_step(state, batch, unlock):
        rng = jax.random.fold_in(state.rng, state.step)
        x = preprocess(batch["images"], train=True, rng=rng, dtype=model.dtype)
        mask = batch["mask"]
        labels = batch["labels"]
        ctrl_in = state.controller

        def loss_fn(params):
            # scales/squeezes are None unless the model's saving flags are
            # set (the reference records them during training too,
            # src/framework.py:158-161).
            (blend, logits, scales, squeezes), mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats, "mmtm": state.mmtm},
                x,
                ctrl_in.curation_mode,
                ctrl_in.caring_modality,
                train=True,
                valid_mask=mask,
                mutable=["batch_stats", "mmtm"],
            )
            loss = blend_loss(logits, labels, mask)
            return loss, (logits, mut, scales, squeezes)

        (loss, (logits, mut, scales, squeezes)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )

        # BDR statistics: grads *before* the update, weights at backward time
        # (reference: src/framework.py:313-315).
        gn = reduce_groups(grads)
        wn = reduce_groups(state.params)

        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        ctrl = controller_update(ctrl_in, gn, wn, unlock)

        blend_acc, per_view_acc = blend_and_per_view_acc(logits, labels, mask)
        out = {
            "loss": loss,
            "acc": blend_acc,
            "acc_modal": per_view_acc,
            "d_BDR": ctrl.d_BDR,
            "curation_mode": ctrl.curation_mode,
            "caring_modality": ctrl.caring_modality,
        }
        if model.saving_mmtm_scales:
            out["mmtmscales_list"] = scales
        if model.saving_mmtm_squeeze_array:
            out["squeezedmaps_array_list"] = squeezes
        new_state = state.replace(
            params=params,
            batch_stats=mut["batch_stats"],
            mmtm=mut["mmtm"],
            opt_state=opt_state,
            controller=ctrl,
            step=state.step + 1,
        )
        return new_state, out

    if not jit:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def _make_eval_core(model, mmtm_off: bool):
    """Shared eval forward for the per-step and scanned eval programs.

    Returns (core, record_pack_spec).  ``core(state, mmtm, batch, avg)``
    evaluates one batch against ``mmtm`` (NOT state.mmtm, so a scan can
    thread the running-average chain) and returns (new_mmtm, out).

    record_pack_spec is the trace-time pack layout for recording outputs:
    (key, mmtm_idx, view_idx, shape) per packed leaf.  Shapes are static
    under jit, so the spec is identical for every call and for both the
    per-step and scanned programs built on the same core.

    SHARING CONTRACT (pinned — see VERDICT r2 #8): the Trainer builds the
    per-step AND the scanned eval program on ONE core_and_spec
    (framework.py:138-144), so both share this single mutable list.  Each
    trace clears and rebuilds it; that is safe *only because* every trace
    of the same core appends an identical spec (static shapes).  If you
    refactor to build the two programs on *separate* `_make_eval_core`
    calls, each gets its own list — fine — but do NOT share one list
    across *different* cores (e.g. recording on vs off): the second trace
    would silently clobber the first's layout.  The rebuild-equality
    assert below turns that mistake into a trace-time error.
    """
    record_pack_spec: list = []

    def core(state, mmtm, batch, average_squeezemaps):
        x = preprocess(batch["images"], train=False, dtype=model.dtype)
        mask = batch["mask"]
        labels = batch["labels"]
        ctrl = state.controller
        (blend, logits, scales, squeezes), mut = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats, "mmtm": mmtm},
            x,
            ctrl.curation_mode,
            ctrl.caring_modality,
            train=False,
            valid_mask=mask,
            mmtm_off=mmtm_off,
            average_squeezemaps=average_squeezemaps,
            mutable=["mmtm"],
        )
        loss = blend_loss(logits, labels, mask)
        blend_acc, per_view_acc = blend_and_per_view_acc(logits, labels, mask)
        out = {"loss": loss, "acc": blend_acc, "acc_modal": per_view_acc}
        # Recording outputs (6+ arrays/step) are packed into ONE flat f32
        # buffer: on a remote backend every extra output buffer costs
        # per-step RPC bookkeeping, and a 150-step recording pass holding
        # ~4,200 live buffers measurably degrades the link (PERF.md).  The
        # concat fuses into the step program — no extra compile/dispatch.
        packed_leaves = []
        prior_spec = list(record_pack_spec)
        record_pack_spec.clear()
        for key, val, enabled in (
            ("mmtmscales_list", scales, model.saving_mmtm_scales),
            ("squeezedmaps_array_list", squeezes, model.saving_mmtm_squeeze_array),
        ):
            if not enabled:
                continue
            for mi, mmtm_arrs in enumerate(val):
                for vi, arr in enumerate(mmtm_arrs):
                    record_pack_spec.append((key, mi, vi, tuple(arr.shape)))
                    packed_leaves.append(jnp.ravel(arr.astype(jnp.float32)))
        if prior_spec and prior_spec != record_pack_spec:
            raise AssertionError(
                "record_pack_spec changed between traces of one eval core "
                f"({prior_spec} -> {record_pack_spec}); per-step and scanned "
                "programs sharing this core would unpack with the wrong layout"
            )
        if packed_leaves:
            out["packed_records"] = jnp.concatenate(packed_leaves)
        return mut["mmtm"], out

    return core, record_pack_spec


def build_eval_step(
    model,
    *,
    mmtm_off: bool = False,
    jit: bool = True,
    core_and_spec=None,
):
    """Returns step(state, batch, average_squeezemaps) -> (new_mmtm, out).

    ``out`` includes per-batch scales / squeeze maps when the model's
    saving flags are set (recording mode, reference: configs/recording.gin),
    packed into ``out['packed_records']`` per ``step.record_pack_spec``.
    """
    core, record_pack_spec = core_and_spec or _make_eval_core(model, mmtm_off)

    def eval_step(state, batch, average_squeezemaps):
        return core(state, state.mmtm, batch, average_squeezemaps)

    stepper = eval_step if not jit else jax.jit(eval_step)

    def wrapped(state, batch, average_squeezemaps):
        return stepper(state, batch, average_squeezemaps)

    wrapped.record_pack_spec = record_pack_spec
    return wrapped


def build_scanned_eval_step(
    model,
    *,
    mmtm_off: bool = False,
    jit: bool = True,
    core_and_spec=None,
):
    """Returns scan_step(state, stacked_batch, average_squeezemaps) ->
    (new_mmtm, outs): K batches evaluated in ONE dispatch.

    ``stacked_batch`` leaves carry a leading scan axis: images (K, B, ...),
    labels (K, B), mask (K, B).  The MMTM running-average chain threads
    through ``lax.scan`` exactly as K sequential per-step calls would
    (quirk #6 ordering preserved); ``outs`` leaves gain a leading K axis.

    Motivation: on a remote backend every per-step dispatch is a link
    round trip (~0.7 s each in degraded windows — PERF.md); scanning
    amortizes one dispatch and one H2D upload over K steps.
    """
    core, record_pack_spec = core_and_spec or _make_eval_core(model, mmtm_off)

    def scan_step(state, stacked_batch, average_squeezemaps):
        def body(mmtm, batch):
            return core(state, mmtm, batch, average_squeezemaps)

        new_mmtm, outs = jax.lax.scan(body, state.mmtm, stacked_batch)
        return new_mmtm, outs

    stepper = scan_step if not jit else jax.jit(scan_step)

    def wrapped(state, stacked_batch, average_squeezemaps):
        return stepper(state, stacked_batch, average_squeezemaps)

    wrapped.record_pack_spec = record_pack_spec
    return wrapped
