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

Backward is a fused Pallas kernel too: the whole cotangent chain
(d_gate reduction → sigmoid/ReLU/matmul chain → d_squeeze broadcast →
d_feature) is per-sample, so one pass over a batch block computes it with
each of do_i / f_i read exactly once and df_i written once; weight
gradients accumulate in revisited output blocks across grid steps.  Plain
XLA needs two passes over do_i (one for the d_gate reduction, one for the
df elementwise), i.e. 8 large streams vs the kernel's 6.  A plain-JAX VJP
is kept for A/B comparison (module flag ``PALLAS_BACKWARD = False``).

Measured verdict (PERF.md): in the full train step XLA's fused gating is
4-6% faster than routing through these kernels — the custom call is a
fusion barrier and the step is MXU-bound — so ``use_pallas`` defaults
off; the kernels remain for hardware where that tradeoff flips.

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
    # Row outputs are (num_blocks, Bb, C): the leading grid axis keeps the
    # last-two block dims equal to the array dims, which Pallas TPU
    # requires for any Bb (a (Bb, C) block needs Bb % 8 == 0 otherwise).
    sq0_ref[0] = sq0
    sq1_ref[0] = sq1
    g0_ref[0] = g0
    g1_ref[0] = g1


def _pick_block(requested: int, S: int, C: int, itemsize: int, n_big_blocks: int,
                budget: int = 12 * 1024 * 1024) -> int:
    """Largest batch-block size whose double-buffered (B_b, S, C) feature
    blocks fit the ~16 MB VMEM (with headroom for weights/row blocks).
    The forward streams 4 big blocks (f0, f1, out0, out1), the backward 6
    (do0, do1, f0, f1, df0, df1)."""
    per_row = S * C * itemsize * n_big_blocks * 2  # x2: Mosaic double-buffers
    cap = max(1, budget // max(per_row, 1))
    block = 1
    while block * 2 <= min(requested, cap):
        block *= 2
    return block


def _fused_forward(f0, f1, wsq, bsq, w0, b0, w1, b1, *, block_b: int, interpret: bool):
    B, S, C = f0.shape
    block_b = _pick_block(block_b, S, C, f0.dtype.itemsize, 4)
    dout = wsq.shape[1]
    grid = (pl.cdiv(B, block_b),)

    def batch_spec():
        return pl.BlockSpec((block_b, S, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    nblocks = pl.cdiv(B, block_b)

    def row_spec(cols):
        # (num_blocks, Bb, cols): last-two block dims == array dims, valid
        # for any Bb (a flat (Bb, cols) block would require Bb % 8 == 0)
        return pl.BlockSpec((1, block_b, cols), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    def full_spec(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((B, S, C), f0.dtype),
        jax.ShapeDtypeStruct((B, S, C), f1.dtype),
        jax.ShapeDtypeStruct((nblocks, block_b, C), jnp.float32),
        jax.ShapeDtypeStruct((nblocks, block_b, C), jnp.float32),
        jax.ShapeDtypeStruct((nblocks, block_b, C), jnp.float32),
        jax.ShapeDtypeStruct((nblocks, block_b, C), jnp.float32),
    )
    out0, out1, sq0, sq1, g0, g1 = pl.pallas_call(
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
    unpack = lambda r: r.reshape(nblocks * block_b, C)[:B]
    return out0, out1, unpack(sq0), unpack(sq1), unpack(g0), unpack(g1)


def _gating_bwd_kernel(
    do0_ref, do1_ref, f0_ref, f1_ref, g0_ref, g1_ref, sq0_ref, sq1_ref,
    wsq_ref, bsq_ref, w0_ref, w1_ref, dg0c_ref, dg1c_ref, dsq0c_ref, dsq1c_ref,
    df0_ref, df1_ref, dwsq_ref, dbsq_ref, dw0_ref, db0_ref, dw1_ref, db1_ref,
    *, total_b: int,
):
    """One batch block: full per-sample cotangent chain + weight-grad
    accumulation.  All arithmetic in f32; S = spatial size.  Rows past
    ``total_b`` (grid padding of the final block) are masked out so they
    cannot pollute the accumulated weight gradients."""
    do0 = do0_ref[:].astype(jnp.float32)  # (Bb, S, C)
    do1 = do1_ref[:].astype(jnp.float32)
    f0 = f0_ref[:].astype(jnp.float32)
    f1 = f1_ref[:].astype(jnp.float32)
    g0 = g0_ref[0]  # row refs are (1, Bb, C) blocks of (nblocks, Bb, C)
    g1 = g1_ref[0]
    S = f0.shape[1]
    Bb = f0.shape[0]

    row = jax.lax.broadcasted_iota(jnp.int32, (Bb, 1), 0) + pl.program_id(0) * Bb
    valid = row < total_b  # (Bb, 1) bool

    # Padded rows hold unspecified values (NaN in interpret mode): every
    # term that feeds a cross-row reduction is where-selected to zero
    # (0 * NaN would stay NaN).
    def clean(x):
        return jnp.where(valid, x, 0.0)

    # d_gate: reduction over spatial (the only place f_i is needed)
    dg0 = clean(jnp.sum(do0 * f0, axis=1) + dg0c_ref[0])
    dg1 = clean(jnp.sum(do1 * f1, axis=1) + dg1c_ref[0])

    # sigmoid backward
    dz0 = clean(dg0 * g0 * (1.0 - g0))
    dz1 = clean(dg1 * g1 * (1.0 - g1))

    # recompute excitation pre-activation from the (tiny) squeeze residuals
    joint = clean(jnp.concatenate([sq0_ref[0], sq1_ref[0]], axis=1))  # (Bb, 2C)
    wsq = wsq_ref[:].astype(jnp.float32)
    pre = jnp.dot(joint, wsq, preferred_element_type=jnp.float32) + bsq_ref[:].astype(jnp.float32)
    e = clean(jnp.maximum(pre, 0.0))

    w0 = w0_ref[:].astype(jnp.float32)
    w1 = w1_ref[:].astype(jnp.float32)
    de = clean(
        (
            jnp.dot(dz0, w0.T, preferred_element_type=jnp.float32)
            + jnp.dot(dz1, w1.T, preferred_element_type=jnp.float32)
        )
        * (pre > 0.0)
    )
    djoint = jnp.dot(de, wsq.T, preferred_element_type=jnp.float32)

    C = f0.shape[2]
    dsq0 = djoint[:, :C] + dsq0c_ref[0]
    dsq1 = djoint[:, C:] + dsq1c_ref[0]

    # df: single elementwise pass (do_i already in VMEM)
    df0_ref[:] = (do0 * g0[:, None, :] + dsq0[:, None, :] / S).astype(df0_ref.dtype)
    df1_ref[:] = (do1 * g1[:, None, :] + dsq1[:, None, :] / S).astype(df1_ref.dtype)

    # weight grads: accumulate into revisited output blocks
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwsq_ref[:] = jnp.zeros_like(dwsq_ref)
        dbsq_ref[:] = jnp.zeros_like(dbsq_ref)
        dw0_ref[:] = jnp.zeros_like(dw0_ref)
        db0_ref[:] = jnp.zeros_like(db0_ref)
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)

    dwsq_ref[:] += jnp.dot(joint.T, de, preferred_element_type=jnp.float32)
    dbsq_ref[:] += jnp.sum(de, axis=0, keepdims=True)
    dw0_ref[:] += jnp.dot(e.T, dz0, preferred_element_type=jnp.float32)
    db0_ref[:] += jnp.sum(dz0, axis=0, keepdims=True)
    dw1_ref[:] += jnp.dot(e.T, dz1, preferred_element_type=jnp.float32)
    db1_ref[:] += jnp.sum(dz1, axis=0, keepdims=True)


def _fused_backward(do0, do1, f0, f1, g0, g1, sq0, sq1, wsq, bsq, w0, w1,
                    dg0c, dg1c, dsq0c, dsq1c, *, block_b: int, interpret: bool):
    B, S, C = f0.shape
    block_b = _pick_block(block_b, S, C, f0.dtype.itemsize, 6)
    D = wsq.shape[1]
    nblocks = pl.cdiv(B, block_b)
    grid = (nblocks,)

    def to_blocks(r):  # (B, C) -> (nblocks, block_b, C), zero-padded
        pad = nblocks * block_b - B
        if pad:
            r = jnp.concatenate([r, jnp.zeros((pad, r.shape[1]), r.dtype)])
        return r.reshape(nblocks, block_b, r.shape[1])

    g0, g1, sq0, sq1 = map(to_blocks, (g0, g1, sq0, sq1))
    dg0c, dg1c, dsq0c, dsq1c = map(to_blocks, (dg0c, dg1c, dsq0c, dsq1c))

    batch_spec = lambda: pl.BlockSpec((block_b, S, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    row_spec = lambda cols: pl.BlockSpec((1, block_b, cols), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    full_spec = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((B, S, C), f0.dtype),      # df0
        jax.ShapeDtypeStruct((B, S, C), f1.dtype),      # df1
        jax.ShapeDtypeStruct((2 * C, D), jnp.float32),  # dwsq
        jax.ShapeDtypeStruct((1, D), jnp.float32),      # dbsq
        jax.ShapeDtypeStruct((D, C), jnp.float32),      # dw0
        jax.ShapeDtypeStruct((1, C), jnp.float32),      # db0
        jax.ShapeDtypeStruct((D, C), jnp.float32),      # dw1
        jax.ShapeDtypeStruct((1, C), jnp.float32),      # db1
    )
    return pl.pallas_call(
        functools.partial(_gating_bwd_kernel, total_b=B),
        grid=grid,
        in_specs=[
            batch_spec(), batch_spec(), batch_spec(), batch_spec(),
            row_spec(C), row_spec(C), row_spec(C), row_spec(C),
            full_spec(wsq.shape), full_spec(bsq.shape),
            full_spec(w0.shape), full_spec(w1.shape),
            row_spec(C), row_spec(C), row_spec(C), row_spec(C),
        ],
        out_specs=(
            batch_spec(), batch_spec(),
            full_spec((2 * C, D)), full_spec((1, D)),
            full_spec((D, C)), full_spec((1, C)),
            full_spec((D, C)), full_spec((1, C)),
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(do0, do1, f0, f1, g0, g1, sq0, sq1, wsq, bsq, w0, w1, dg0c, dg1c, dsq0c, dsq1c)


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
    residuals = (f0, f1, wsq, bsq, w0, b0, w1, b1, sq0, sq1, g0, g1)
    return outs, residuals


# Fused Pallas backward by default; flip to the plain-JAX VJP (two passes
# over the upstream cotangents) for A/B measurement.
PALLAS_BACKWARD = True


def _bwd(block_b, interpret, residuals, cotangents):
    if PALLAS_BACKWARD:
        return _bwd_pallas(block_b, interpret, residuals, cotangents)
    return _bwd_jax(block_b, interpret, residuals, cotangents)


def _bwd_pallas(block_b, interpret, residuals, cotangents):
    f0, f1, wsq, bsq, w0, b0, w1, b1, sq0, sq1, g0, g1 = residuals
    do0, do1, dsq0_c, dsq1_c, dg0_c, dg1_c = cotangents
    D = wsq.shape[1]
    df0, df1, dwsq, dbsq, dw0, db0, dw1, db1 = _fused_backward(
        do0.astype(f0.dtype), do1.astype(f1.dtype), f0, f1, g0, g1, sq0, sq1,
        wsq, bsq.reshape(1, D), w0, w1,
        dg0_c.astype(jnp.float32), dg1_c.astype(jnp.float32),
        dsq0_c.astype(jnp.float32), dsq1_c.astype(jnp.float32),
        block_b=block_b, interpret=interpret,
    )
    return (
        df0,
        df1,
        dwsq.astype(wsq.dtype),
        dbsq.reshape(-1).astype(bsq.dtype),
        dw0.astype(w0.dtype),
        db0.reshape(-1).astype(b0.dtype),
        dw1.astype(w1.dtype),
        db1.reshape(-1).astype(b1.dtype),
    )


def _bwd_jax(block_b, interpret, residuals, cotangents):
    f0, f1, wsq, bsq, w0, b0, w1, b1, sq0, sq1, g0, g1 = residuals
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
        dbsq.astype(bsq.dtype),
        dw0.astype(w0.dtype),
        db0.astype(b0.dtype),
        dw1.astype(w1.dtype),
        db1.astype(b1.dtype),
    )


fused_mmtm_gating.defvjp(_fwd, _bwd)
