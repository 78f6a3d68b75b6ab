"""Fold running BatchNorm statistics into conv weights for inference.

A serving-path transform (predict.py / eval_sweep.py / tools/mfu_probe.py):
with BN in eval mode (use_running_average=True) the affine normalize is a
per-channel linear map, so it folds exactly into the preceding conv's
kernel — the BN module then reduces to an identity-with-bias that XLA
fuses into the conv epilogue.  The reference has no analogue (its
torchvision towers always execute BN, reference: src/model.py:64-107).

Pairing convention (models/resnet.py): within one scope, ``bn1``/``bn2``
normalize ``conv1``/``conv2``'s output and ``downsample_bn`` normalizes
``downsample_conv``'s — i.e. the conv name is the BN name with "bn"
replaced by "conv".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fold_batchnorm(params, batch_stats, eps: float = 1e-5):
    """Return (params', batch_stats') with BN folded into conv kernels.

    For every BN scope with running stats (mean, var) and affine
    (scale, bias) whose sibling conv kernel is (kh, kw, cin, cout):

        k' = k * g,   g = scale / sqrt(var + eps)        (per cout)
        BN becomes identity-with-bias: scale'=1, bias'=bias - mean*g,
        mean'=0, var'=1-eps  (so rsqrt(var'+eps) == 1 exactly).

    Numerically equivalent at eval (use_running_average=True); training
    passes must NOT use a folded state (its batch statistics would be
    computed over already-normalized activations).
    """

    def to_dict(t):
        return {k: to_dict(v) for k, v in t.items()} if isinstance(t, dict) else t

    out_p = to_dict(params)
    out_s = to_dict(batch_stats)

    def walk(p_node, s_node):
        for name, s_child in list(s_node.items()):
            if isinstance(s_child, dict) and set(s_child) == {"mean", "var"}:
                conv_name = name.replace("bn", "conv")
                if conv_name == name or conv_name not in p_node:
                    continue  # non-conv-paired BN (none in the shipped models)
                bn_p = p_node[name]
                conv_p = p_node[conv_name]
                g = bn_p["scale"] * jax.lax.rsqrt(s_child["var"] + eps)
                conv_p["kernel"] = (conv_p["kernel"].astype(jnp.float32) * g).astype(
                    conv_p["kernel"].dtype
                )
                bn_p["bias"] = bn_p["bias"] - s_child["mean"] * g
                bn_p["scale"] = jnp.ones_like(bn_p["scale"])
                s_child["mean"] = jnp.zeros_like(s_child["mean"])
                s_child["var"] = jnp.full_like(s_child["var"], 1.0 - eps)
            elif isinstance(s_child, dict):
                walk(p_node[name], s_child)

    walk(out_p, out_s)
    return out_p, out_s
