#!/usr/bin/env python3
"""MMTM gating kernel A/B + roofline: fused Pallas vs XLA, fwd and fwd+bwd.

For each (B, S, C) the minimum HBM traffic is computed analytically:

  forward : read f0,f1 + write out0,out1            = 4·B·S·C·bytes
  backward: read do0,do1,f0,f1 + write df0,df1      = 6·B·S·C·bytes
  (weights/gates/squeezes are KB-scale — ignored)

XLA executes the unfused math as separate squeeze/apply (fwd) and
reduction/elementwise (bwd) kernels, re-reading the big tensors once more
per pass (6 and 8 streams respectively).  Achieved GB/s = min_bytes / time,
compared against the v5e HBM peak (~819 GB/s).

Run on the TPU:  python tools/bench_mmtm_kernel.py [--steps 30]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from greedy_multimodal_learning_tpu.ops.mmtm_pallas import fused_mmtm_gating  # noqa: E402

HBM_PEAK_GBPS = 819.0  # v5e

# (label, B, S, C): the flagship model's three fusion points at 224px input
# for B in {128, 256}, plus a 3D-family shape (T*H*W spatial, C=256).
SHAPES = [
    ("mmtm2_B128", 128, 784, 128),
    ("mmtm3_B128", 128, 196, 256),
    ("mmtm4_B128", 128, 49, 512),
    ("mmtm2_B256", 256, 784, 128),
    ("mmtm3_B256", 256, 196, 256),
    ("mmtm4_B256", 256, 49, 512),
    ("3d_mmtm3_B8", 8, 8 * 14 * 14, 256),
]


def xla_gating(f0, f1, wsq, bsq, w0, b0, w1, b1):
    sq0 = jnp.mean(f0.astype(jnp.float32), axis=1)
    sq1 = jnp.mean(f1.astype(jnp.float32), axis=1)
    e = jax.nn.relu(
        (jnp.concatenate([sq0, sq1], 1).astype(f0.dtype) @ wsq).astype(jnp.float32) + bsq
    )
    g0 = jax.nn.sigmoid((e.astype(f0.dtype) @ w0).astype(jnp.float32) + b0)
    g1 = jax.nn.sigmoid((e.astype(f0.dtype) @ w1).astype(jnp.float32) + b1)
    return f0 * g0[:, None, :].astype(f0.dtype), f1 * g1[:, None, :].astype(f1.dtype)


def timeit_fn(fn, args, steps):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x[0, 0]) if hasattr(x, "shape") and x.ndim >= 2 else x, out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    float(leaves[0].reshape(-1)[0])  # host fetch = reliable sync on this backend
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--block-b", type=int, default=8)
    args = ap.parse_args()
    dtype = jnp.dtype(args.dtype)
    bytes_per = dtype.itemsize

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    results = []
    for label, B, S, C in SHAPES:
        r = np.random.default_rng(0)
        D = int(2 * 2 * C / 4)  # dim_out = 2*sum(dims)/ratio with ratio 4
        f0 = jnp.asarray(r.normal(size=(B, S, C)), dtype)
        f1 = jnp.asarray(r.normal(size=(B, S, C)), dtype)
        wsq = jnp.asarray(r.normal(size=(2 * C, D)) * 0.05, dtype)
        bsq = jnp.asarray(r.normal(size=(D,)) * 0.1, jnp.float32)
        w0 = jnp.asarray(r.normal(size=(D, C)) * 0.05, dtype)
        b0 = jnp.asarray(r.normal(size=(C,)) * 0.1, jnp.float32)
        w1 = jnp.asarray(r.normal(size=(D, C)) * 0.05, dtype)
        b1 = jnp.asarray(r.normal(size=(C,)) * 0.1, jnp.float32)
        weights = (wsq, bsq.astype(dtype), w0, b0.astype(dtype), w1, b1.astype(dtype))
        wargs = (f0, f1) + weights

        # ---- forward (scalar-reduced outputs: raw multi-MB outputs make
        # the remote backend's per-call buffer RPCs dominate) ----
        def reduce2(o0, o1):
            return jnp.sum(o0.astype(jnp.float32)) + jnp.sum(o1.astype(jnp.float32))

        xla_fwd = jax.jit(lambda *a: reduce2(*xla_gating(*a)))
        pl_fwd = jax.jit(lambda *a: reduce2(*fused_mmtm_gating(*a, args.block_b, False)[:2]))
        t_xla_f = timeit_fn(xla_fwd, wargs, args.steps)
        t_pl_f = timeit_fn(pl_fwd, wargs, args.steps)

        # ---- fwd+bwd (grads wrt features + weights) ----
        def loss_xla(*a):
            o0, o1 = xla_gating(*a)
            return jnp.sum(o0.astype(jnp.float32) * 0.5) + jnp.sum(o1.astype(jnp.float32) * 0.25)

        def loss_pl(*a):
            o0, o1 = fused_mmtm_gating(*a, args.block_b, False)[:2]
            return jnp.sum(o0.astype(jnp.float32) * 0.5) + jnp.sum(o1.astype(jnp.float32) * 0.25)

        def grad_norm(grad_fn):
            def fn(*a):
                gs = grad_fn(*a)
                return sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in gs)

            return jax.jit(fn)

        xla_vg = grad_norm(jax.grad(loss_xla, argnums=(0, 1, 2, 4, 6)))
        pl_vg = grad_norm(jax.grad(loss_pl, argnums=(0, 1, 2, 4, 6)))
        t_xla_b = timeit_fn(xla_vg, wargs, args.steps)
        t_pl_b = timeit_fn(pl_vg, wargs, args.steps)

        fwd_min_gb = 4 * B * S * C * bytes_per / 1e9
        tot_min_gb = (4 + 6) * B * S * C * bytes_per / 1e9
        row = {
            "shape": label,
            "B": B, "S": S, "C": C,
            "fwd_xla_us": round(t_xla_f * 1e6, 1),
            "fwd_pallas_us": round(t_pl_f * 1e6, 1),
            "fwd_speedup": round(t_xla_f / t_pl_f, 3),
            "fwdbwd_xla_us": round(t_xla_b * 1e6, 1),
            "fwdbwd_pallas_us": round(t_pl_b * 1e6, 1),
            "fwdbwd_speedup": round(t_xla_b / t_pl_b, 3),
            "fwd_pallas_pct_of_sol": round(100 * fwd_min_gb / t_pl_f / HBM_PEAK_GBPS, 1),
            "fwd_xla_pct_of_sol": round(100 * fwd_min_gb / t_xla_f / HBM_PEAK_GBPS, 1),
            "fwdbwd_pallas_pct_of_sol": round(100 * tot_min_gb / t_pl_b / HBM_PEAK_GBPS, 1),
            "fwdbwd_xla_pct_of_sol": round(100 * tot_min_gb / t_xla_b / HBM_PEAK_GBPS, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"hbm_peak_gbps": HBM_PEAK_GBPS, "dtype": str(dtype)}), flush=True)


if __name__ == "__main__":
    main()
