"""3D-CNN model family tests (BASELINE config 4)."""

import numpy as np

import jax
import jax.numpy as jnp

from greedy_multimodal_learning_tpu.models import MMTM3DCNN, ResNet3D18Trunk


def test_resnet3d_trunk_shapes():
    m = ResNet3D18Trunk(nclasses=5, width_multiplier=0.25)
    x = jnp.zeros((2, 4, 16, 16, 3))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(variables, x, train=False)
    assert y.shape == (2, 5)


def test_mmtm_3dcnn_three_modalities_train_step_state():
    m = MMTM3DCNN(nclasses=5, num_towers=3, width_multiplier=0.25)
    x = [jnp.zeros((2, 4, 16, 16, 3)) for _ in range(3)]
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    assert set(variables.keys()) == {"params", "batch_stats", "mmtm"}
    (blend, logits, _, _), mut = m.apply(
        variables,
        x,
        jnp.asarray(True),
        jnp.asarray(2, jnp.int32),
        train=True,
        valid_mask=jnp.asarray([1.0, 0.0]),
        mutable=["batch_stats", "mmtm"],
    )
    assert blend.shape == (2, 5)
    assert len(logits) == 3
    assert float(mut["mmtm"]["mmtm2"]["step"]) == 1.0
    np.testing.assert_allclose(
        np.asarray(blend), sum(np.asarray(l) for l in logits) / 3, rtol=1e-5
    )
    # BDR grouping works for 3 towers
    from greedy_multimodal_learning_tpu.engine.bdr import build_group_matrix

    mat = build_group_matrix(
        variables["params"],
        ["net_view_0", "net_view_1", "net_view_2"],
        ["rgb", "depth", "flow"],
    )
    assert mat.shape[1] == 6
    assert mat.sum() > 0
