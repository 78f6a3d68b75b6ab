"""Tests for pytree host-transfer helpers (utils/pytree.py).

``bulk_device_get`` is the remote-backend-friendly replacement for
``jax.device_get`` used by the epoch-end record fetch
(engine/framework.py); it must be value-identical to a plain fetch for
arbitrary mixed pytrees.
"""

import jax
import jax.numpy as jnp
import numpy as np

from greedy_multimodal_learning_tpu.utils.pytree import (
    _PACK_CHUNK,
    _PACK_MIN_LEAVES,
    bulk_device_get,
)


def _assert_trees_equal(got, want):
    jax.tree_util.tree_map(
        lambda g, w: np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
        if hasattr(w, "shape") or isinstance(w, (int, float))
        else None,
        got,
        want,
    )


def test_bulk_device_get_matches_device_get_on_record_list():
    # Shaped like the recording pass: many identically-structured records,
    # mixed dtypes, scalars, host leaves, and None.  64 records x 5 device
    # leaves = 320 >= _PACK_MIN_LEAVES, so this exercises the *packed*
    # path (below the threshold bulk_device_get falls back to plain
    # overlapped fetches — covered by the few-leaf test).
    records = []
    for r in range(64):
        records.append(
            {
                "squeeze": jnp.full((8, 128), r, jnp.float32),
                "gate": jnp.arange(8 * 256, dtype=jnp.float32).reshape(8, 256) * r,
                "loss": jnp.float32(r) / 7.0,
                "count": jnp.int32(r + 1),
                "bf16": jnp.full((4,), r, jnp.bfloat16),
                "host_scalar": float(r),
                "missing": None,
            }
        )
    got = bulk_device_get(records)
    want = jax.device_get(records)
    for g, w in zip(got, want):
        assert g["missing"] is None
        for k in ("squeeze", "gate", "loss", "count", "bf16", "host_scalar"):
            np.testing.assert_array_equal(np.asarray(g[k]), np.asarray(w[k]))
        # Leaves come back as host numpy, not device arrays.
        assert not isinstance(g["squeeze"], jax.Array) or isinstance(g["squeeze"], np.ndarray)


def test_bulk_device_get_spans_multiple_chunks():
    n = _PACK_CHUNK * 2 + 5  # force >2 chunks in one dtype group
    tree = [jnp.full((3,), i, jnp.float32) for i in range(n)]
    got = bulk_device_get(tree)
    assert len(got) == n
    for i, g in enumerate(got):
        np.testing.assert_array_equal(g, np.full((3,), i, np.float32))


def test_bulk_device_get_few_leaf_plain_path():
    # Below _PACK_MIN_LEAVES the packer must not engage (each signature
    # would cost an XLA compile); values still come back exact.
    n = _PACK_MIN_LEAVES // 4
    tree = {"v": [jnp.full((2,), i, jnp.float32) for i in range(n)], "s": jnp.int32(7)}
    got = bulk_device_get(tree)
    assert int(got["s"]) == 7
    for i, g in enumerate(got["v"]):
        assert isinstance(g, np.ndarray)
        np.testing.assert_array_equal(g, np.full((2,), i, np.float32))


def test_bulk_device_get_host_only_tree():
    tree = {"a": np.ones((2, 2)), "b": 3, "c": None}
    got = bulk_device_get(tree)
    np.testing.assert_array_equal(got["a"], np.ones((2, 2)))
    assert got["b"] == 3 and got["c"] is None


def test_bulk_device_get_packs_few_large_leaves():
    """Few leaves but a large payload must take the PACK path (the scanned
    recording eval's ~15 x 0.5 MB packed-record buffers measured 295 s
    through the plain per-buffer D2H on the tunneled backend) and stay
    value-identical, including mixed dtypes and a scalar tail."""
    from greedy_multimodal_learning_tpu.utils.pytree import _PACK_MIN_BYTES

    r = np.random.default_rng(0)
    big = [jax.device_put(jnp.asarray(r.normal(size=(10, 40_000)), jnp.float32)) for _ in range(3)]
    assert 3 * big[0].size * 4 > _PACK_MIN_BYTES
    tree = {
        "records": big,
        "loss": jax.device_put(jnp.asarray(1.5, jnp.float32)),
        "count": jax.device_put(jnp.asarray(7, jnp.int32)),
        "host": np.arange(4),
    }
    got = bulk_device_get(tree)
    _assert_trees_equal(got, jax.device_get(tree))
    assert isinstance(got["records"][0], np.ndarray)
