"""Distributed tests on the virtual 8-device CPU mesh: the sharded train
step must match the single-device step numerically (SURVEY §4 distributed
test plan)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from greedy_multimodal_learning_tpu.engine import create_train_state, make_optimizer
from greedy_multimodal_learning_tpu.engine.bdr import build_group_matrix
from greedy_multimodal_learning_tpu.engine.steps import build_train_step, make_controller_update
from greedy_multimodal_learning_tpu.models import MMTMMVCNN
from greedy_multimodal_learning_tpu.parallel import make_mesh, shard_batch, shard_train_state


def _setup(batch=8, image=32, momentum=0.0):
    model = MMTMMVCNN(nclasses=4, num_towers=2)
    optimizer = make_optimizer(lr=0.1, momentum=momentum)
    sample = jnp.zeros((batch, 2, image, image, 3), jnp.float32)
    state = create_train_state(model, optimizer, jax.random.PRNGKey(0), sample)
    gm = build_group_matrix(state.params, ["net_view_0", "net_view_1"], ["visual", "skeleton"])
    ctrl = make_controller_update("guided", 2, epsilon=0.01, curation_windowsize=5)
    step = build_train_step(model, optimizer, gm, ctrl, donate=False)
    rng = np.random.default_rng(0)
    batches = [
        {
            "images": rng.integers(0, 255, (batch, 2, image, image, 3), dtype=np.uint8),
            "labels": rng.integers(0, 4, (batch,)).astype(np.int32),
            "indices": np.arange(batch, dtype=np.int32),
            "mask": np.ones((batch,), np.float32),
        }
        for _ in range(2)
    ]
    return model, optimizer, state, step, batches


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("momentum", [0.0, 0.9])
def test_sharded_step_matches_single_device(momentum):
    model, optimizer, state0, step, batches = _setup(momentum=momentum)

    # single-device reference trajectory
    s = state0
    ref_losses = []
    ref_params_1 = None
    for b in batches:
        s, out = step(s, b, jnp.asarray(True))
        ref_losses.append(float(out["loss"]))
        if ref_params_1 is None:
            ref_params_1 = jax.device_get(s.params)

    # sharded trajectory: dp=4 x tp=2
    mesh = make_mesh(jax.devices()[:8], model_parallel=2)
    sh_state = shard_train_state(state0, mesh)
    if momentum:
        # the momentum trace must be sharded like its parameters, not
        # replicated: at least one trace leaf carries the model axis
        from greedy_multimodal_learning_tpu.utils.pytree import tree_paths

        specs = {
            path: getattr(leaf.sharding, "spec", None)
            for path, leaf in tree_paths(sh_state.opt_state)
            if hasattr(leaf, "sharding") and hasattr(leaf, "ndim") and leaf.ndim >= 2
        }
        assert any(spec is not None and "model" in tuple(spec) for spec in specs.values()), specs
    sh_losses = []
    sh_params_1 = None
    with mesh:
        for b in batches:
            sh_state, out = step(sh_state, shard_batch(b, mesh), jnp.asarray(True))
            sh_losses.append(float(out["loss"]))
            if sh_params_1 is None:
                sh_params_1 = jax.device_get(sh_state.params)

    # Losses over the 2-step trajectory agree tightly; params are compared
    # after ONE step (further steps amplify f32 reduction-order noise
    # chaotically through BN rsqrt at lr 0.1).
    np.testing.assert_allclose(sh_losses, ref_losses, rtol=1e-4)
    flat_ref = jax.tree_util.tree_leaves(ref_params_1)
    flat_sh = jax.tree_util.tree_leaves(sh_params_1)
    assert len(flat_ref) == len(flat_sh)
    for a, b in zip(flat_ref, flat_sh):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_pure_dp_mesh():
    model, optimizer, state0, step, batches = _setup()
    mesh = make_mesh(jax.devices()[:8], model_parallel=1)
    sh_state = shard_train_state(state0, mesh)
    with mesh:
        sh_state, out = step(sh_state, shard_batch(batches[0], mesh), jnp.asarray(False))
    assert np.isfinite(float(out["loss"]))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tp4_mesh():
    """4-way tensor parallelism over the model axis (dims 512/256 divisible)."""
    model, optimizer, state0, step, batches = _setup()
    mesh = make_mesh(jax.devices()[:8], model_parallel=4)
    sh_state = shard_train_state(state0, mesh)
    with mesh:
        sh_state, out = step(sh_state, shard_batch(batches[0], mesh), jnp.asarray(True))
    assert np.isfinite(float(out["loss"]))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_3d_step_matches_single_device():
    """3-modality 3D-CNN family under dp=4 x tp=2: the sharding rules are
    shape-driven and must place 5-D conv kernels (kt, kh, kw, cin, cout)
    exactly like 4-D ones; the sharded trajectory must match the
    single-device one.  min_shard_dim=64 so the width-0.25 trunks still
    exercise TP."""
    from greedy_multimodal_learning_tpu.models import MMTM3DCNN

    batch, frames, image = 8, 2, 16
    model = MMTM3DCNN(nclasses=4, num_towers=3, width_multiplier=0.25)
    optimizer = make_optimizer(lr=0.1)
    sample = jnp.zeros((batch, 3, frames, image, image, 3), jnp.float32)
    state0 = create_train_state(model, optimizer, jax.random.PRNGKey(0), sample, num_modalities=3)
    gm = build_group_matrix(
        state0.params, ["net_view_0", "net_view_1", "net_view_2"], ["rgb", "depth", "flow"]
    )
    ctrl = make_controller_update("guided", 3, epsilon=0.01, curation_windowsize=5)
    step = build_train_step(model, optimizer, gm, ctrl, donate=False)
    rng = np.random.default_rng(3)
    batches = [
        {
            "images": rng.integers(0, 255, (batch, 3, frames, image, image, 3), dtype=np.uint8),
            "labels": rng.integers(0, 4, (batch,)).astype(np.int32),
            "indices": np.arange(batch, dtype=np.int32),
            "mask": np.ones((batch,), np.float32),
        }
        for _ in range(2)
    ]

    s = state0
    ref_losses = []
    for b in batches:
        s, out = step(s, b, jnp.asarray(True))
        ref_losses.append(float(out["loss"]))

    mesh = make_mesh(jax.devices()[:8], model_parallel=2)
    sh_state = shard_train_state(state0, mesh, min_shard_dim=64)
    # the widest 3D kernels must actually land on the model axis
    from greedy_multimodal_learning_tpu.utils.pytree import tree_paths

    assert any(
        leaf.ndim == 5 and getattr(leaf.sharding, "spec", None) is not None
        and "model" in tuple(leaf.sharding.spec)
        for _, leaf in tree_paths(sh_state.params)
        if hasattr(leaf, "sharding")
    )
    sh_losses = []
    with mesh:
        for b in batches:
            sh_state, out = step(sh_state, shard_batch(b, mesh), jnp.asarray(True))
            sh_losses.append(float(out["loss"]))

    np.testing.assert_allclose(sh_losses, ref_losses, rtol=1e-4)
