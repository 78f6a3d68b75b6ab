"""Fused Pallas MMTM gating kernel vs the reference JAX path (interpret
mode on CPU), forward + VJP + full-module equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from greedy_multimodal_learning_tpu.models import MMTM
from greedy_multimodal_learning_tpu.ops import fused_mmtm_gating


def _ref_gating(f0, f1, wsq, bsq, w0, b0, w1, b1):
    sq0 = jnp.mean(f0, axis=1)
    sq1 = jnp.mean(f1, axis=1)
    e = jax.nn.relu(jnp.concatenate([sq0, sq1], 1) @ wsq + bsq)
    g0 = jax.nn.sigmoid(e @ w0 + b0)
    g1 = jax.nn.sigmoid(e @ w1 + b1)
    return f0 * g0[:, None, :], f1 * g1[:, None, :], sq0, sq1, g0, g1


@pytest.fixture
def gating_inputs():
    rng = np.random.default_rng(0)
    B, S, C, D = 8, 10, 16, 16
    f0 = jnp.asarray(rng.normal(size=(B, S, C)), jnp.float32)
    f1 = jnp.asarray(rng.normal(size=(B, S, C)), jnp.float32)
    wsq = jnp.asarray(rng.normal(size=(2 * C, D)) * 0.2, jnp.float32)
    bsq = jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32)
    w0 = jnp.asarray(rng.normal(size=(D, C)) * 0.2, jnp.float32)
    b0 = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(D, C)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)
    return f0, f1, wsq, bsq, w0, b0, w1, b1


def test_fused_forward_matches_reference(gating_inputs):
    outs = fused_mmtm_gating(*gating_inputs, 4, True)
    ref = _ref_gating(*gating_inputs)
    for a, b in zip(outs, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-5)


def test_fused_forward_ragged_batch(gating_inputs):
    """Batch not divisible by the block size."""
    f0, f1, *w = gating_inputs
    outs = fused_mmtm_gating(f0[:6], f1[:6], *w, 4, True)
    ref = _ref_gating(f0[:6], f1[:6], *w)
    for a, b in zip(outs, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-5)


def test_fused_vjp_matches_reference(gating_inputs):
    def loss_fused(*args):
        o0, o1, s0, s1, g0, g1 = fused_mmtm_gating(*args, 4, True)
        return jnp.sum(o0 * o0) + jnp.sum(jnp.sin(o1)) + jnp.sum(g0) + 0.5 * jnp.sum(s1)

    def loss_ref(*args):
        o0, o1, s0, s1, g0, g1 = _ref_gating(*args)
        return jnp.sum(o0 * o0) + jnp.sum(jnp.sin(o1)) + jnp.sum(g0) + 0.5 * jnp.sum(s1)

    g_fused = jax.grad(loss_fused, argnums=tuple(range(8)))(*gating_inputs)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(8)))(*gating_inputs)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_mmtm_module_pallas_equivalence():
    """Full module: pallas path == jax path (gates, state, outputs),
    including the curation branch."""
    f0 = jnp.asarray(np.random.default_rng(1).normal(size=(4, 5, 5, 8)), jnp.float32)
    f1 = jnp.asarray(np.random.default_rng(2).normal(size=(4, 5, 5, 8)), jnp.float32)

    m_jax = MMTM(dims=[8, 8], ratio=4.0, use_pallas=False)
    m_pl = MMTM(dims=[8, 8], ratio=4.0, use_pallas=True)
    variables = m_jax.init(jax.random.PRNGKey(0), [f0, f1])

    for cur, care in [(False, 0), (True, 0), (True, 1)]:
        (outs_j, sc_j, sq_j), mut_j = m_jax.apply(
            variables, [f0, f1],
            curation_mode=jnp.asarray(cur), caring_modality=jnp.asarray(care, jnp.int32),
            return_scale=True, return_squeezed_mps=True, mutable=["mmtm"],
        )
        (outs_p, sc_p, sq_p), mut_p = m_pl.apply(
            variables, [f0, f1],
            curation_mode=jnp.asarray(cur), caring_modality=jnp.asarray(care, jnp.int32),
            return_scale=True, return_squeezed_mps=True, mutable=["mmtm"],
        )
        for a, b in zip(outs_j, outs_p):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-5)
        for a, b in zip(sc_j, sc_p):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-5)
        for a, b in zip(sq_j, sq_p):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-5)
        for k in mut_j["mmtm"]:
            np.testing.assert_allclose(
                np.asarray(mut_j["mmtm"][k]), np.asarray(mut_p["mmtm"][k]), rtol=2e-5, atol=1e-5
            )


def test_mmtm_module_pallas_gradients_match():
    f0 = jnp.asarray(np.random.default_rng(3).normal(size=(4, 5, 5, 8)), jnp.float32)
    f1 = jnp.asarray(np.random.default_rng(4).normal(size=(4, 5, 5, 8)), jnp.float32)
    m_jax = MMTM(dims=[8, 8], ratio=4.0, use_pallas=False)
    m_pl = MMTM(dims=[8, 8], ratio=4.0, use_pallas=True)
    variables = m_jax.init(jax.random.PRNGKey(0), [f0, f1])

    def loss(params, module):
        (outs, _, _), _ = module.apply(
            {**variables, "params": params}, [f0, f1], mutable=["mmtm"]
        )
        return jnp.sum(outs[0] ** 2) + jnp.sum(jnp.abs(outs[1]))

    gj = jax.grad(loss)(variables["params"], m_jax)
    gp = jax.grad(loss)(variables["params"], m_pl)
    flat_j = jax.tree_util.tree_leaves(gj)
    flat_p = jax.tree_util.tree_leaves(gp)
    for a, b in zip(flat_j, flat_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_fused_vjp_ragged_and_backward_ab(gating_inputs):
    """Ragged batch (padded final block) + Pallas-vs-JAX backward A/B:
    the fused backward kernel must match the plain-JAX VJP exactly,
    including masked weight-gradient accumulation over grid padding."""
    from greedy_multimodal_learning_tpu.ops import mmtm_pallas

    f0, f1, *w = gating_inputs
    args = (f0[:6], f1[:6], *w)

    def loss(*a):
        o0, o1, s0, s1, g0, g1 = fused_mmtm_gating(*a, 4, True)
        return jnp.sum(o0 * o0) + jnp.sum(jnp.sin(o1)) + jnp.sum(g1) + 0.25 * jnp.sum(s0)

    assert mmtm_pallas.PALLAS_BACKWARD  # default: fused backward
    g_pallas = jax.grad(loss, argnums=tuple(range(8)))(*args)
    mmtm_pallas.PALLAS_BACKWARD = False
    try:
        g_jax = jax.grad(loss, argnums=tuple(range(8)))(*args)
    finally:
        mmtm_pallas.PALLAS_BACKWARD = True
    for a, b in zip(g_pallas, g_jax):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_fused_vjp_mixed_precision_biases(gating_inputs):
    """bf16 kernels + f32 biases: bias cotangents must carry the bias
    primal dtype (custom_vjp rejects dtype mismatches)."""
    f0, f1, wsq, bsq, w0, b0, w1, b1 = gating_inputs
    args = (
        f0.astype(jnp.bfloat16), f1.astype(jnp.bfloat16),
        wsq.astype(jnp.bfloat16), bsq,  # f32 bias
        w0.astype(jnp.bfloat16), b0,
        w1.astype(jnp.bfloat16), b1,
    )

    def loss(*a):
        o0, o1, *_ = fused_mmtm_gating(*a, 4, True)
        return jnp.sum(o0.astype(jnp.float32)) + jnp.sum(o1.astype(jnp.float32))

    grads = jax.grad(loss, argnums=(3, 5, 7))(*args)
    for g, primal in zip(grads, (bsq, b0, b1)):
        assert g.dtype == primal.dtype
        assert np.isfinite(np.asarray(g, np.float32)).all()


def test_mmtm_module_pallas_equivalence_bf16():
    """Under bf16 compute the kernel's matmuls run at the same precision as
    TorchLinear's (weights cast to the compute dtype), so the pallas path
    stays a performance toggle — not a numerics change."""
    f0 = jnp.asarray(np.random.default_rng(1).normal(size=(4, 5, 5, 8)), jnp.bfloat16)
    f1 = jnp.asarray(np.random.default_rng(2).normal(size=(4, 5, 5, 8)), jnp.bfloat16)

    m_jax = MMTM(dims=[8, 8], ratio=4.0, use_pallas=False, dtype=jnp.bfloat16)
    m_pl = MMTM(dims=[8, 8], ratio=4.0, use_pallas=True, dtype=jnp.bfloat16)
    variables = m_jax.init(jax.random.PRNGKey(0), [f0, f1])

    (outs_j, sc_j, _), mut_j = m_jax.apply(
        variables, [f0, f1], return_scale=True, mutable=["mmtm"],
    )
    (outs_p, sc_p, _), mut_p = m_pl.apply(
        variables, [f0, f1], return_scale=True, mutable=["mmtm"],
    )
    # bf16 has ~3 decimal digits; the two paths reduce in different orders
    for a, b in zip(outs_j, outs_p):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=2e-2, atol=2e-2
        )
    for a, b in zip(sc_j, sc_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-2)
    for k in mut_j["mmtm"]:
        np.testing.assert_allclose(
            np.asarray(mut_j["mmtm"][k]), np.asarray(mut_p["mmtm"][k]), rtol=2e-2, atol=2e-2
        )


def test_mmtm_kernel_guard_falls_back_on_unequal_spatial():
    """Different per-modality spatial sizes must take the general JAX path
    (the kernel indexes both modalities by f0's shape)."""
    f0 = jnp.asarray(np.random.default_rng(1).normal(size=(4, 6, 6, 8)), jnp.float32)
    f1 = jnp.asarray(np.random.default_rng(2).normal(size=(4, 3, 3, 8)), jnp.float32)
    m = MMTM(dims=[8, 8], ratio=4.0, use_pallas=True)
    variables = m.init(jax.random.PRNGKey(0), [f0, f1])
    (outs, _, _), _ = m.apply(variables, [f0, f1], mutable=["mmtm"])
    assert outs[0].shape == f0.shape and outs[1].shape == f1.shape
