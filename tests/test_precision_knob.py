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
    """The config must actually reach precision-unannotated dot ops.

    Asserted on the lowered StableHLO (backend-independent): XLA-CPU
    *computes* f32 either way, so a numeric probe can't see the setting
    there — but the emitted ``precision`` attribute is what the TPU
    compiler keys bf16-vs-f32 MXU passes on."""
    a = jnp.ones((8, 8), jnp.float32)
    b = jnp.ones((8, 8), jnp.float32)

    _set_matmul_precision("highest")
    hi_txt = jax.jit(lambda x, y: x @ y).lower(a, b).as_text()
    assert "precision = [HIGHEST, HIGHEST]" in hi_txt

    _set_matmul_precision("bfloat16")
    lo_txt = jax.jit(lambda x, y: x @ y).lower(a, b).as_text()
    assert "HIGHEST" not in lo_txt
