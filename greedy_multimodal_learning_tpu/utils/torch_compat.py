"""PyTorch checkpoint interop.

The reference stores checkpoints as ``{'model': state_dict, 'optimizer':
state_dict}`` via torch.save (reference: src/utils.py:107-115).  The parity
requirement (BASELINE.json north star: reproduce numbers "against reference
checkpoints") needs a state_dict -> flax pytree converter, including
conv OIHW->HWIO and linear (out,in)->(in,out) transposes and BN buffer
routing into the ``batch_stats`` collection.

Name mapping (torchvision resnet18 towers inside MMTM_MVCNN,
reference: src/model.py:53-60):

    net_view_i.conv1.weight            -> params/net_view_i/conv1/kernel
    net_view_i.bn1.{weight,bias}       -> params/net_view_i/bn1/{scale,bias}
    net_view_i.bn1.running_{mean,var}  -> batch_stats/net_view_i/bn1/{mean,var}
    net_view_i.layerL.B.convK.weight   -> params/net_view_i/layerL_B/convK/kernel
    net_view_i.layerL.B.downsample.0/1 -> .../layerL_B/downsample_conv|downsample_bn
    net_view_i.fc.{weight,bias}        -> params/net_view_i/fc/{kernel,bias}
    mmtmI.fc_*.{weight,bias}           -> params/mmtmI/fc_*/{kernel,bias}
"""

from __future__ import annotations

import logging
import re
from typing import Dict, Tuple

import numpy as np


def _convert_entry(torch_key: str, array: np.ndarray):
    """Map one state_dict entry -> (collection, path tuple, array)."""
    parts = torch_key.split(".")
    leaf = parts[-1]
    module_parts = parts[:-1]

    # layerL.B -> layerL_B ; downsample.0 -> downsample_conv, .1 -> downsample_bn
    mapped = []
    i = 0
    while i < len(module_parts):
        p = module_parts[i]
        m = re.fullmatch(r"layer(\d)", p)
        if m and i + 1 < len(module_parts) and module_parts[i + 1].isdigit():
            mapped.append(f"layer{m.group(1)}_{module_parts[i + 1]}")
            i += 2
            continue
        if p == "downsample" and i + 1 < len(module_parts):
            mapped.append("downsample_conv" if module_parts[i + 1] == "0" else "downsample_bn")
            i += 2
            continue
        mapped.append(p)
        i += 1

    if leaf == "running_mean":
        return "batch_stats", tuple(mapped) + ("mean",), array
    if leaf == "running_var":
        return "batch_stats", tuple(mapped) + ("var",), array
    if leaf == "num_batches_tracked":
        return None, None, None

    is_conv = array.ndim >= 3  # convNd weight (O, I, *spatial)
    is_linear_w = leaf == "weight" and array.ndim == 2
    is_bn_like = leaf in ("weight", "bias") and array.ndim == 1 and (
        mapped and ("bn" in mapped[-1] or mapped[-1].startswith("downsample_bn"))
    )

    if is_conv:
        # torch (O, I, *spatial) -> flax (*spatial, I, O)
        axes = tuple(range(2, array.ndim)) + (1, 0)
        return "params", tuple(mapped) + ("kernel",), np.transpose(array, axes)
    if is_linear_w:
        return "params", tuple(mapped) + ("kernel",), np.transpose(array, (1, 0))
    if is_bn_like:
        name = "scale" if leaf == "weight" else "bias"
        return "params", tuple(mapped) + (name,), array
    if leaf == "bias":
        return "params", tuple(mapped) + ("bias",), array
    if leaf == "weight":  # 1-D non-BN weight (unused today)
        return "params", tuple(mapped) + ("scale",), array
    return "params", tuple(mapped) + (leaf,), array


def state_dict_to_pytrees(state_dict) -> Tuple[Dict, Dict]:
    """torch state_dict -> (params, batch_stats) nested dicts."""
    params: Dict = {}
    batch_stats: Dict = {}
    for key, value in state_dict.items():
        arr = value.detach().cpu().numpy() if hasattr(value, "detach") else np.asarray(value)
        coll, path, arr = _convert_entry(key, arr)
        if coll is None:
            continue
        root = params if coll == "params" else batch_stats
        node = root
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = arr
    return params, batch_stats


def load_reference_checkpoint(path):
    """Read a reference ``model_*.pt`` file -> (params, batch_stats)
    (reference loader: src/training_loop.py:78-83)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    return state_dict_to_pytrees(state)


def merge_loaded_params(target, loaded):
    """Non-strict merge mirroring the reference's dict-update +
    load_state_dict(strict=False) (reference: src/training_loop.py:80-82):
    entries present in ``loaded`` override ``target``; missing keys keep the
    freshly initialized values; shape mismatches raise."""

    matched = 0

    def merge(dst, src, prefix=""):
        nonlocal matched
        out = dict(dst)
        for k, v in src.items():
            if k not in out:
                continue  # strict=False: ignore unexpected keys
            if isinstance(v, dict) and isinstance(out[k], dict):
                out[k] = merge(out[k], v, prefix + k + "/")
            else:
                if tuple(np.shape(out[k])) != tuple(np.shape(v)):
                    raise ValueError(f"shape mismatch at {prefix + k}: {np.shape(out[k])} vs {np.shape(v)}")
                # dtype read off the target leaf directly: materializing a
                # device-resident target via np.asarray would trigger a
                # serial D2H fetch per leaf (minutes per checkpoint on a
                # tunneled backend); device targets stay untouched.
                dtype = out[k].dtype if hasattr(out[k], "dtype") else np.asarray(out[k]).dtype
                out[k] = np.asarray(v, dtype=dtype)
                matched += 1
        return out

    result = merge(target, loaded)
    if loaded and matched == 0:
        # strict=False tolerates partial overlap, but a checkpoint whose
        # keys match NOTHING would silently leave the fresh random init.
        logging.getLogger(__name__).warning(
            "checkpoint merge matched 0 of %d loaded entries — the target keeps "
            "its initialization (wrong file, or a non-checkpoint pickle?)",
            len(loaded),
        )
    return result
