"""Checkpoint save/load.

The reference saves ``{'model': state_dict, 'optimizer': state_dict}`` via
torch.save (reference: src/utils.py:107-115) to ``model_best_val.pt`` /
``model_last_epoch.pt`` (reference: src/training_loop.py:39-48).  This module
writes the same artifact names in a torch-loadable format (state_dict with
torch-layout tensors via the reverse converter), so reference tooling can
consume rebuild checkpoints, plus a JAX-native sidecar
(``<file>.jax.pkl``) carrying everything torch has no slot for: MMTM
running-average buffers (plain attributes in the reference, never saved),
optimizer/controller/RNG state — enabling *exact* resume, which the
reference lacks (SURVEY §5: crash-resume material but no resume logic).

Loading honors the reference's non-strict merge semantics
(dict.update + load_state_dict(strict=False), reference:
src/training_loop.py:78-83).
"""

from __future__ import annotations

import logging
import os
import pickle

import jax
import numpy as np

from ..utils.pytree import tree_to_numpy
from ..utils.torch_compat import merge_loaded_params, state_dict_to_pytrees

logger = logging.getLogger(__name__)


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,))
    else:
        yield prefix, tree


def pytrees_to_state_dict(params, batch_stats):
    """Inverse of torch_compat.state_dict_to_pytrees: flax pytrees ->
    torch-style state_dict with OIHW convs / (out,in) linears."""
    out = {}
    for path, leaf in _flatten(tree_to_numpy(params)):
        arr = np.asarray(leaf)
        parts, leafname = list(path[:-1]), path[-1]
        tparts = _torchify_path(parts)
        if leafname == "kernel":
            if arr.ndim >= 3:  # convNd: flax (*spatial, I, O) -> torch (O, I, *spatial)
                axes = (arr.ndim - 1, arr.ndim - 2) + tuple(range(arr.ndim - 2))
                out[".".join(tparts + ["weight"])] = np.transpose(arr, axes)
            else:
                out[".".join(tparts + ["weight"])] = np.transpose(arr, (1, 0))
        elif leafname == "scale":
            out[".".join(tparts + ["weight"])] = arr
        else:
            out[".".join(tparts + [leafname])] = arr
    for path, leaf in _flatten(tree_to_numpy(batch_stats)):
        parts, leafname = list(path[:-1]), path[-1]
        tparts = _torchify_path(parts)
        name = "running_mean" if leafname == "mean" else "running_var"
        out[".".join(tparts + [name])] = np.asarray(leaf)
    return out


def _torchify_path(parts):
    import re

    tparts = []
    for p in parts:
        m = re.fullmatch(r"layer(\d)_(\d)", p)
        if m:
            tparts.extend([f"layer{m.group(1)}", m.group(2)])
        elif p == "downsample_conv":
            tparts.extend(["downsample", "0"])
        elif p == "downsample_bn":
            tparts.extend(["downsample", "1"])
        else:
            tparts.append(p)
    return tparts


def save_weights(state, filepath):
    """Write torch-format model checkpoint + JAX sidecar for exact resume.

    Writes are atomic (temp file + rename): a crash mid-save must never
    leave a truncated checkpoint that breaks the next resume."""
    state_dict = pytrees_to_state_dict(state.params, state.batch_stats)
    payload = {"model": state_dict, "optimizer": {}}
    tmp = filepath + ".tmp"
    try:
        import torch

        payload["model"] = {k: torch.from_numpy(np.array(v, copy=True)) for k, v in state_dict.items()}
        torch.save(payload, tmp)
    except ImportError:  # torch-free host: plain pickle with numpy arrays
        with open(tmp, "wb") as f:
            pickle.dump(payload, f, pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, filepath)

    sidecar = {
        "params": tree_to_numpy(state.params),
        "batch_stats": tree_to_numpy(state.batch_stats),
        "mmtm": tree_to_numpy(state.mmtm),
        "controller": tree_to_numpy(
            {
                "M_main": state.controller.M_main,
                "M_bypass": state.controller.M_bypass,
                "curation_mode": state.controller.curation_mode,
                "caring_modality": state.controller.caring_modality,
                "curation_step": state.controller.curation_step,
                "d_BDR": state.controller.d_BDR,
                "rng": state.controller.rng,
            }
        ),
        "step": np.asarray(state.step),
        "rng": np.asarray(state.rng),
        "opt_hyperparams": tree_to_numpy(dict(state.opt_state.hyperparams)) if hasattr(state.opt_state, "hyperparams") else {},
        # Full optimizer state (momentum traces etc.) so a sidecar resume is
        # exact for train.momentum > 0 too (the reference checkpoints its
        # optimizer state_dict, src/utils.py:107-115).
        "opt_state": tree_to_numpy(state.opt_state) if state.opt_state is not None else None,
    }
    with open(filepath + ".jax.pkl.tmp", "wb") as f:
        pickle.dump(sidecar, f, pickle.HIGHEST_PROTOCOL)
    os.replace(filepath + ".jax.pkl.tmp", filepath + ".jax.pkl")


def load_pretrained(filepath):
    """Read a checkpoint into (params, batch_stats, extras|None).

    Accepts rebuild checkpoints (sidecar preferred) and original reference
    ``.pt`` files (torch state_dict, converted)."""
    if not filepath:
        raise ValueError(
            "checkpoint path is required (e.g. bind "
            "eval_.pretrained_weights_path='RUN/model_best_val.pt')"
        )
    sidecar_path = filepath + ".jax.pkl"
    if os.path.exists(sidecar_path):
        with open(sidecar_path, "rb") as f:
            sc = pickle.load(f)
        return sc["params"], sc["batch_stats"], sc

    try:
        import torch

        ckpt = torch.load(filepath, map_location="cpu", weights_only=False)
    except Exception:
        with open(filepath, "rb") as f:
            ckpt = pickle.load(f)
    state = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    params, batch_stats = state_dict_to_pytrees(state)
    return params, batch_stats, None


def state_to_tree(state) -> dict:
    """Full TrainState -> pure-array pytree (for Orbax / serialization)."""
    tree = {
        "params": tree_to_numpy(state.params),
        "batch_stats": tree_to_numpy(state.batch_stats),
        "mmtm": tree_to_numpy(state.mmtm),
        "controller": tree_to_numpy(
            {
                "M_main": state.controller.M_main,
                "M_bypass": state.controller.M_bypass,
                "curation_mode": state.controller.curation_mode,
                "caring_modality": state.controller.caring_modality,
                "curation_step": state.controller.curation_step,
                "d_BDR": state.controller.d_BDR,
                "rng": state.controller.rng,
            }
        ),
        "step": np.asarray(state.step),
        "rng": np.asarray(state.rng),
    }
    if state.opt_state is not None:
        tree["opt_state"] = tree_to_numpy(state.opt_state)
    return tree


def tree_into_state(state, tree):
    """Inverse of state_to_tree: write a restored pytree into a TrainState
    (structure must match; full exact resume incl. optimizer moments)."""
    c = tree["controller"]
    new = state.replace(
        params=tree["params"],
        batch_stats=tree["batch_stats"],
        mmtm=tree["mmtm"],
        controller=state.controller.replace(**{k: np.asarray(v) for k, v in c.items()}),
        step=np.asarray(tree["step"]),
        rng=np.asarray(tree["rng"]),
    )
    if "opt_state" in tree and state.opt_state is not None:
        restored = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(state.opt_state),
            jax.tree_util.tree_leaves(tree["opt_state"]),
        )
        new = new.replace(opt_state=restored)
    return new


class OrbaxCheckpointer:
    """Async full-state checkpointing via orbax CheckpointManager — the
    production backend (SURVEY §5: the reference has synchronous torch.save
    only).  Saves are non-blocking; ``wait()`` flushes before exit."""

    def __init__(self, directory, max_to_keep: int = 2):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        os.makedirs(directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, state):
        self.manager.save(int(step), args=self._ocp.args.StandardSave(state_to_tree(state)))

    def latest_step(self):
        return self.manager.latest_step()

    def restore_latest(self, state):
        step = self.manager.latest_step()
        if step is None:
            return state, None
        template = state_to_tree(state)
        tree = self.manager.restore(step, args=self._ocp.args.StandardRestore(template))
        return tree_into_state(state, tree), step

    def wait(self):
        self.manager.wait_until_finished()


def load_into_state(state, filepath, full_restore: bool = False):
    """Non-strict merge of a checkpoint into a fresh TrainState
    (reference semantics: src/training_loop.py:78-83).

    ``full_restore=True`` additionally restores controller state, global
    step, data RNG and optimizer hyperparameters from the sidecar — exact
    resume, a capability the reference lacks (SURVEY §5)."""
    params, batch_stats, extras = load_pretrained(filepath)
    # Merge the loaded host arrays INTO the device-resident state: leaves
    # present in the checkpoint become host numpy (device_put on next step
    # dispatch); absent leaves keep their freshly-initialized *device*
    # arrays untouched.  The previous approach fetched the whole fresh
    # state to host first — ~90 MB of serial D2H per load, minutes on a
    # tunneled backend, for values that were about to be overwritten.
    merged_p = merge_loaded_params(state.params, params)
    merged_b = merge_loaded_params(state.batch_stats, batch_stats)
    new_state = state.replace(params=merged_p, batch_stats=merged_b)
    if extras is not None and extras.get("mmtm"):
        merged_m = merge_loaded_params(state.mmtm, extras["mmtm"])
        new_state = new_state.replace(mmtm=merged_m)
    if full_restore and extras is not None:
        c = extras.get("controller")
        if c:
            new_state = new_state.replace(
                controller=state.controller.replace(
                    M_main=np.asarray(c["M_main"]),
                    M_bypass=np.asarray(c["M_bypass"]),
                    curation_mode=np.asarray(c["curation_mode"]),
                    caring_modality=np.asarray(c["caring_modality"]),
                    curation_step=np.asarray(c["curation_step"]),
                    d_BDR=np.asarray(c["d_BDR"]),
                    rng=np.asarray(c["rng"]),
                )
            )
        if "step" in extras:
            new_state = new_state.replace(step=np.asarray(extras["step"]))
        if "rng" in extras:
            new_state = new_state.replace(rng=np.asarray(extras["rng"]))
        restored = None
        if extras.get("opt_state") is not None and new_state.opt_state is not None:
            # Full optimizer-state restore (momentum traces + hyperparams):
            # the pickled tree has the same optax structure, so a
            # leaves-into-template unflatten is exact.  Optimizer-config
            # drift between save and resume (e.g. momentum toggled, optax
            # layout change) yields a different leaf count — degrade to the
            # hyperparams-only path rather than aborting the resume.
            try:
                restored = jax.tree_util.tree_unflatten(
                    jax.tree_util.tree_structure(new_state.opt_state),
                    jax.tree_util.tree_leaves(extras["opt_state"]),
                )
            except (ValueError, TypeError) as e:
                logger.warning(
                    "checkpoint opt_state does not match the current optimizer "
                    "(%s); restoring hyperparameters only", e
                )
        if restored is not None:
            new_state = new_state.replace(opt_state=restored)
        else:
            # older sidecars: hyperparams (LR) only
            hyper = extras.get("opt_hyperparams") or {}
            if hyper and new_state.opt_state is not None and hasattr(new_state.opt_state, "hyperparams"):
                merged = dict(new_state.opt_state.hyperparams)
                for k, v in hyper.items():
                    merged[k] = np.asarray(v)
                new_state = new_state.replace(opt_state=new_state.opt_state._replace(hyperparams=merged))
    logger.info("Done reloading!")
    return new_state
