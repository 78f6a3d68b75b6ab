"""The matmul-precision knob (train./eval_.matmul_precision).

On TPU the backend's DEFAULT matmul precision rounds matmul/conv inputs to
bf16 on the MXU (f32 accumulate); 'highest' multiplies in full f32 — the
like-for-like setting against f32 CPU baselines (the reference trains in
stock torch f32, reference: src/model.py:53-60).  The knob pins
``jax_default_matmul_precision`` process-wide; its measured effect on
trained endpoints is committed in results/parity/precision_ab.json.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from greedy_multimodal_learning_tpu.entries import _set_matmul_precision


@pytest.fixture
def restore_precision():
    old = jax.config.jax_default_matmul_precision
    yield
    jax.config.update("jax_default_matmul_precision", old)


def test_knob_updates_config(restore_precision):
    _set_matmul_precision("highest")
    assert jax.config.jax_default_matmul_precision == "highest"


def test_none_leaves_config_untouched(restore_precision):
    _set_matmul_precision("highest")
    _set_matmul_precision(None)  # None = keep whatever is set
    assert jax.config.jax_default_matmul_precision == "highest"


def test_precision_governs_traced_matmuls(restore_precision):
    """The config must actually reach precision-unannotated dot ops —
    on CPU 'highest' vs 'bfloat16' input rounding produces different
    f32 products for values with >8 mantissa bits."""
    a = jnp.full((64, 64), np.float32(1.0 + 2.0**-12))
    b = jnp.eye(64, dtype=jnp.float32)

    _set_matmul_precision("highest")
    hi = jax.jit(lambda x, y: x @ y)(a, b)

    _set_matmul_precision("bfloat16")
    lo = jax.jit(lambda x, y: x @ y)(a, b)

    assert np.allclose(np.asarray(hi), 1.0 + 2.0**-12)
    # bf16 rounding drops the 2^-12 ulp entirely
    assert np.allclose(np.asarray(lo), 1.0)
