"""Fused MMTM gating as a Pallas TPU kernel.

The MMTM hot path is HBM-bandwidth bound: the joint squeeze needs a full
read of both feature maps and the gate application needs a second read plus
a write (reference math: src/balanced_mmtm.py:94-154).  XLA keeps the two
passes separate because the spatial mean feeds matmuls whose outputs
broadcast back over the same tensors.  This kernel performs

    squeeze (per-sample spatial mean over both modalities)
    → excitation  relu(fc_squeeze)
    → gates       sigmoid(fc_visual / fc_skeleton)
    → scaled features f_i * g_i

in a single pass over a batch block held in VMEM: each feature map is read
from HBM exactly once and written once — the speed-of-light for this op.
The (tiny) cross-batch work (running-average update, curation select) stays
in JAX on (B, C) gates.

Backward is a custom VJP in plain JAX (same traffic as the XLA baseline:
one read of f for d_gate, one write of d_f).

2-modality, equal-dims, joint-squeeze path only (the flagship model's
configuration); other modes fall back to the JAX implementation in
models/mmtm.py.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gating_kernel(f0_ref, f1_ref, wsq_ref, bsq_ref, w0_ref, b0_ref, w1_ref, b1_ref,
                   out0_ref, out1_ref, sq0_ref, sq1_ref, g0_ref, g1_ref):
    f0 = f0_ref[:]  # (Bb, S, C)
    f1 = f1_ref[:]

    sq0 = jnp.mean(f0.astype(jnp.float32), axis=1)  # (Bb, C)
    sq1 = jnp.mean(f1.astype(jnp.float32), axis=1)

    joint = jnp.concatenate([sq0, sq1], axis=1)  # (Bb, 2C)
    e = jnp.maximum(
        jnp.dot(joint.astype(wsq_ref.dtype), wsq_ref[:], preferred_element_type=jnp.float32)
        + bsq_ref[:].astype(jnp.float32),
        0.0,
    )
    g0 = jax.nn.sigmoid(
        jnp.dot(e.astype(w0_ref.dtype), w0_ref[:], preferred_element_type=jnp.float32)
        + b0_ref[:].astype(jnp.float32)
    )
    g1 = jax.nn.sigmoid(
        jnp.dot(e.astype(w1_ref.dtype), w1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[:].astype(jnp.float32)
    )

    out0_ref[:] = (f0 * g0[:, None, :].astype(f0.dtype))
    out1_ref[:] = (f1 * g1[:, None, :].astype(f1.dtype))
    sq0_ref[:] = sq0
    sq1_ref[:] = sq1
    g0_ref[:] = g0
    g1_ref[:] = g1


def _fused_forward(f0, f1, wsq, bsq, w0, b0, w1, b1, *, block_b: int, interpret: bool):
    B, S, C = f0.shape
    dout = wsq.shape[1]
    grid = (pl.cdiv(B, block_b),)

    def batch_spec():
        return pl.BlockSpec((block_b, S, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    def row_spec(cols):
        return pl.BlockSpec((block_b, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def full_spec(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((B, S, C), f0.dtype),
        jax.ShapeDtypeStruct((B, S, C), f1.dtype),
        jax.ShapeDtypeStruct((B, C), jnp.float32),
        jax.ShapeDtypeStruct((B, C), jnp.float32),
        jax.ShapeDtypeStruct((B, C), jnp.float32),
        jax.ShapeDtypeStruct((B, C), jnp.float32),
    )
    return pl.pallas_call(
        _gating_kernel,
        grid=grid,
        in_specs=[
            batch_spec(),
            batch_spec(),
            full_spec(wsq.shape),
            full_spec(bsq.shape),
            full_spec(w0.shape),
            full_spec(b0.shape),
            full_spec(w1.shape),
            full_spec(b1.shape),
        ],
        out_specs=(
            batch_spec(),
            batch_spec(),
            row_spec(C),
            row_spec(C),
            row_spec(C),
            row_spec(C),
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(f0, f1, wsq, bsq, w0, b0, w1, b1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_mmtm_gating(f0, f1, wsq, bsq, w0, b0, w1, b1, block_b=8, interpret=False):
    """Returns (out0, out1, sq0, sq1, g0, g1).

    f_i: (B, S, C) flattened-spatial features; weights in flax layout
    (in, out).  sq/g outputs are float32.
    """
    return _fused_forward(f0, f1, wsq, bsq, w0, b0, w1, b1, block_b=block_b, interpret=interpret)


def _fwd(f0, f1, wsq, bsq, w0, b0, w1, b1, block_b, interpret):
    outs = _fused_forward(f0, f1, wsq, bsq, w0, b0, w1, b1, block_b=block_b, interpret=interpret)
    out0, out1, sq0, sq1, g0, g1 = outs
    residuals = (f0, f1, wsq, bsq, w0, w1, sq0, sq1, g0, g1)
    return outs, residuals


def _bwd(block_b, interpret, residuals, cotangents):
    f0, f1, wsq, bsq, w0, w1, sq0, sq1, g0, g1 = residuals
    do0, do1, dsq0_c, dsq1_c, dg0_c, dg1_c = cotangents
    S = f0.shape[1]

    do0 = do0.astype(jnp.float32)
    do1 = do1.astype(jnp.float32)
    f0f = f0.astype(jnp.float32)
    f1f = f1.astype(jnp.float32)

    # out_i = f_i * g_i
    dg0 = jnp.einsum("bsc,bsc->bc", do0, f0f) + dg0_c
    dg1 = jnp.einsum("bsc,bsc->bc", do1, f1f) + dg1_c
    df0 = do0 * g0[:, None, :]
    df1 = do1 * g1[:, None, :]

    # sigmoid
    dz0 = dg0 * g0 * (1.0 - g0)
    dz1 = dg1 * g1 * (1.0 - g1)

    # recompute excitation (cheap: (B,2C)@(2C,Dout))
    joint = jnp.concatenate([sq0, sq1], axis=1)
    pre = joint @ wsq.astype(jnp.float32) + bsq.astype(jnp.float32)
    e = jnp.maximum(pre, 0.0)

    dw0 = e.T @ dz0
    db0 = jnp.sum(dz0, axis=0)
    dw1 = e.T @ dz1
    db1 = jnp.sum(dz1, axis=0)

    de = dz0 @ w0.astype(jnp.float32).T + dz1 @ w1.astype(jnp.float32).T
    de = de * (pre > 0.0)

    dwsq = joint.T @ de
    dbsq = jnp.sum(de, axis=0)
    djoint = de @ wsq.astype(jnp.float32).T

    C = f0.shape[2]
    dsq0 = djoint[:, :C] + dsq0_c
    dsq1 = djoint[:, C:] + dsq1_c

    df0 = df0 + dsq0[:, None, :] / S
    df1 = df1 + dsq1[:, None, :] / S

    return (
        df0.astype(f0.dtype),
        df1.astype(f1.dtype),
        dwsq.astype(wsq.dtype),
        dbsq.astype(wsq.dtype),
        dw0.astype(w0.dtype),
        db0.astype(w0.dtype),
        dw1.astype(w1.dtype),
        db1.astype(w1.dtype),
    )


fused_mmtm_gating.defvjp(_fwd, _bwd)
