"""Model-layer correctness tests.

Strategy (SURVEY §4): unit tests against NumPy oracles transliterated from
the reference's *behavior* (gate math incl. curation branches and
running-average update order, reference src/balanced_mmtm.py:94-154), plus
numeric parity against torch/torchvision modules via the checkpoint
converter."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from greedy_multimodal_learning_tpu.models import MMTM, MMTMMVCNN, TorchBatchNorm
from greedy_multimodal_learning_tpu.models.resnet import ResNet18Trunk
from greedy_multimodal_learning_tpu.utils.torch_compat import (
    merge_loaded_params,
    state_dict_to_pytrees,
)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


class NumpyMMTMOracle:
    """Oracle for the reference MMTM forward (src/balanced_mmtm.py:94-154),
    2 modalities, joint squeeze path."""

    def __init__(self, params, dims, bug_compat=True):
        self.p = params
        self.dims = dims
        self.avg = [np.zeros(d, np.float32) for d in dims]
        self.step = 0
        self.bug_compat = bug_compat

    def forward(self, f0, f1, curation_mode=False, caring_modality=0):
        # NHWC inputs
        sq0 = f0.reshape(f0.shape[0], -1, f0.shape[-1]).mean(1)
        sq1 = f1.reshape(f1.shape[0], -1, f1.shape[-1]).mean(1)
        joint = np.concatenate([sq0, sq1], 1)
        exc = np.maximum(joint @ self.p["fc_squeeze"]["kernel"] + self.p["fc_squeeze"]["bias"], 0)
        g0 = _sigmoid(exc @ self.p["fc_visual"]["kernel"] + self.p["fc_visual"]["bias"])
        g1 = _sigmoid(exc @ self.p["fc_skeleton"]["kernel"] + self.p["fc_skeleton"]["bias"])
        src0 = g0.mean(0)
        src1 = g0.mean(0) if self.bug_compat else g1.mean(0)
        self.avg[0] = (src0 + self.avg[0] * self.step) / (self.step + 1)
        self.avg[1] = (src1 + self.avg[1] * self.step) / (self.step + 1)
        self.step += 1
        use0 = curation_mode and caring_modality == 0
        use1 = curation_mode and caring_modality == 1
        eff0 = np.broadcast_to(self.avg[0], g0.shape) if use0 else g0
        eff1 = np.broadcast_to(self.avg[1], g1.shape) if use1 else g1
        out0 = f0 * eff0[:, None, None, :]
        out1 = f1 * eff1[:, None, None, :]
        return out0, out1, (g0, g1), (sq0, sq1)


@pytest.fixture
def mmtm_setup():
    m = MMTM(dims=[8, 8], ratio=4.0)
    rng = jax.random.PRNGKey(0)
    f0 = jax.random.normal(jax.random.PRNGKey(1), (4, 5, 5, 8))
    f1 = jax.random.normal(jax.random.PRNGKey(2), (4, 5, 5, 8))
    variables = m.init(rng, [f0, f1])
    return m, variables, np.asarray(f0), np.asarray(f1)


def _np_params(variables):
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    return p


def test_mmtm_matches_numpy_oracle(mmtm_setup):
    m, variables, f0, f1 = mmtm_setup
    oracle = NumpyMMTMOracle(_np_params(variables), [8, 8], bug_compat=True)

    state = variables
    for step, (cur, care) in enumerate([(False, 0), (True, 0), (True, 1), (False, 1)]):
        (outs, scales, sqs), mut = m.apply(
            state,
            [jnp.asarray(f0), jnp.asarray(f1)],
            curation_mode=jnp.asarray(cur),
            caring_modality=jnp.asarray(care, jnp.int32),
            return_scale=True,
            return_squeezed_mps=True,
            mutable=["mmtm"],
        )
        ref0, ref1, (g0, g1), (sq0, sq1) = oracle.forward(f0, f1, cur, care)
        np.testing.assert_allclose(np.asarray(outs[0]), ref0, rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(outs[1]), ref1, rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(scales[0]), g0, rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(sqs[1]), sq1, rtol=2e-5, atol=2e-6)
        state = {**state, "mmtm": mut["mmtm"]}
        np.testing.assert_allclose(
            np.asarray(mut["mmtm"]["running_avg_visual"]), oracle.avg[0], rtol=2e-5, atol=2e-6
        )
        # bug_compat: skeleton average tracks the *visual* gate
        np.testing.assert_allclose(
            np.asarray(mut["mmtm"]["running_avg_skeleton"]), oracle.avg[1], rtol=2e-5, atol=2e-6
        )
        assert float(mut["mmtm"]["step"]) == step + 1


def test_mmtm_bug_compat_off(mmtm_setup):
    m, variables, f0, f1 = mmtm_setup
    m2 = MMTM(dims=[8, 8], ratio=4.0, bug_compat=False)
    oracle = NumpyMMTMOracle(_np_params(variables), [8, 8], bug_compat=False)
    (outs, _, _), mut = m2.apply(
        variables,
        [jnp.asarray(f0), jnp.asarray(f1)],
        mutable=["mmtm"],
    )
    oracle.forward(f0, f1)
    np.testing.assert_allclose(
        np.asarray(mut["mmtm"]["running_avg_skeleton"]), oracle.avg[1], rtol=2e-5, atol=2e-6
    )


def test_mmtm_masked_batch_running_avg(mmtm_setup):
    """Padded rows must not contribute to the running-average update."""
    m, variables, f0, f1 = mmtm_setup
    mask = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    (_, scales, _), mut = m.apply(
        variables,
        [jnp.asarray(f0), jnp.asarray(f1)],
        valid_mask=mask,
        return_scale=True,
        mutable=["mmtm"],
    )
    g0 = np.asarray(scales[0])
    expected = g0[:3].mean(0)  # only valid rows
    np.testing.assert_allclose(np.asarray(mut["mmtm"]["running_avg_visual"]), expected, rtol=2e-5, atol=2e-6)


def test_mmtm_turnoff_cross_modal_flow(mmtm_setup):
    """mmtm_off: each modality's partner squeeze replaced by a supplied
    average map (reference src/balanced_mmtm.py:72-91)."""
    m, variables, f0, f1 = mmtm_setup
    p = _np_params(variables)
    avg0 = np.linspace(0, 1, 8).astype(np.float32)
    avg1 = np.linspace(1, 2, 8).astype(np.float32)
    (outs, scales, _), _ = m.apply(
        variables,
        [jnp.asarray(f0), jnp.asarray(f1)],
        turnoff_cross_modal_flow=True,
        average_squeezemaps=[avg0, avg1],
        return_scale=True,
        mutable=["mmtm"],
    )
    sq0 = f0.reshape(4, -1, 8).mean(1)
    sq1 = f1.reshape(4, -1, 8).mean(1)
    mixed0 = np.concatenate([sq0, np.broadcast_to(avg1, (4, 8))], 1)
    exc0 = np.maximum(mixed0 @ p["fc_squeeze"]["kernel"] + p["fc_squeeze"]["bias"], 0)
    g0 = _sigmoid(exc0 @ p["fc_visual"]["kernel"] + p["fc_visual"]["bias"])
    mixed1 = np.concatenate([np.broadcast_to(avg0, (4, 8)), sq1], 1)
    exc1 = np.maximum(mixed1 @ p["fc_squeeze"]["kernel"] + p["fc_squeeze"]["bias"], 0)
    g1 = _sigmoid(exc1 @ p["fc_skeleton"]["kernel"] + p["fc_skeleton"]["bias"])
    np.testing.assert_allclose(np.asarray(scales[0]), g0, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(scales[1]), g1, rtol=2e-5, atol=2e-6)


def test_batchnorm_matches_torch():
    torch = pytest.importorskip("torch")
    tbn = torch.nn.BatchNorm2d(6)
    with torch.no_grad():
        tbn.weight.copy_(torch.linspace(0.5, 1.5, 6))
        tbn.bias.copy_(torch.linspace(-0.2, 0.2, 6))

    bn = TorchBatchNorm()
    x1 = np.random.default_rng(0).normal(size=(4, 5, 5, 6)).astype(np.float32)
    x2 = np.random.default_rng(1).normal(size=(4, 5, 5, 6)).astype(np.float32)

    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x1), use_running_average=False)
    variables = {
        "params": {
            "scale": np.linspace(0.5, 1.5, 6, dtype=np.float32),
            "bias": np.linspace(-0.2, 0.2, 6, dtype=np.float32),
        },
        "batch_stats": variables["batch_stats"],
    }

    state = variables
    tbn.train()
    for x in (x1, x2):
        y, mut = bn.apply(state, jnp.asarray(x), use_running_average=False, mutable=["batch_stats"])
        ty = tbn(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).detach().numpy()
        np.testing.assert_allclose(np.asarray(y), ty, rtol=1e-4, atol=1e-5)
        state = {**state, "batch_stats": mut["batch_stats"]}

    np.testing.assert_allclose(
        np.asarray(state["batch_stats"]["mean"]), tbn.running_mean.numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(state["batch_stats"]["var"]), tbn.running_var.numpy(), rtol=1e-5, atol=1e-6
    )

    tbn.eval()
    y, _ = bn.apply(state, jnp.asarray(x1), use_running_average=True, mutable=[])
    ty = tbn(torch.from_numpy(x1).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).detach().numpy()
    np.testing.assert_allclose(np.asarray(y), ty, rtol=1e-4, atol=1e-5)


def test_batchnorm_mask_equals_smaller_batch():
    """Masked stats over a padded batch == stats over the unpadded batch."""
    bn = TorchBatchNorm()
    x = np.random.default_rng(2).normal(size=(4, 3, 3, 5)).astype(np.float32)
    xp = np.concatenate([x, np.zeros((2, 3, 3, 5), np.float32)])
    mask = jnp.asarray([1, 1, 1, 1, 0, 0], jnp.float32)

    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), use_running_average=False)
    y_small, mut_small = bn.apply(variables, jnp.asarray(x), use_running_average=False, mutable=["batch_stats"])
    y_pad, mut_pad = bn.apply(
        variables, jnp.asarray(xp), use_running_average=False, mask=mask, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(np.asarray(y_pad)[:4], np.asarray(y_small), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mut_pad["batch_stats"]["mean"]), np.asarray(mut_small["batch_stats"]["mean"]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(mut_pad["batch_stats"]["var"]), np.asarray(mut_small["batch_stats"]["var"]), rtol=1e-5, atol=1e-6
    )


def _torch_resnet18(torch, num_classes=40):
    """Independent torch oracle with torchvision resnet18's architecture and
    state_dict naming (standard published architecture; torchvision itself is
    not installed in this environment)."""
    nn = torch.nn

    class BasicBlock(nn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout)
                )

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return self.relu(out + idt)

    class ResNet18(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            widths = [64, 128, 256, 512]
            cin = 64
            for li, w in enumerate(widths):
                stride = 1 if li == 0 else 2
                setattr(self, f"layer{li + 1}", nn.Sequential(BasicBlock(cin, w, stride), BasicBlock(w, w, 1)))
                cin = w
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
            self.fc = nn.Linear(512, num_classes)
            for m in self.modules():
                if isinstance(m, nn.Conv2d):
                    nn.init.kaiming_normal_(m.weight, mode="fan_out", nonlinearity="relu")

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for li in (1, 2, 3, 4):
                x = getattr(self, f"layer{li}")(x)
            x = torch.flatten(self.avgpool(x), 1)
            return self.fc(x)

    return ResNet18()


def test_resnet18_matches_torch_oracle():
    """Port torch-oracle resnet18 weights through the converter and compare
    eval-mode logits (validates conv/BN/pool semantics + the converter)."""
    torch = pytest.importorskip("torch")

    tmodel = _torch_resnet18(torch, num_classes=40)
    tmodel.eval()

    x = np.random.default_rng(3).normal(size=(2, 64, 64, 3)).astype(np.float32)

    model = ResNet18Trunk(nclasses=40)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    params, batch_stats = state_dict_to_pytrees(tmodel.state_dict())
    merged_params = merge_loaded_params(
        jax.tree_util.tree_map(np.asarray, variables["params"]), params
    )
    merged_stats = merge_loaded_params(
        jax.tree_util.tree_map(np.asarray, variables["batch_stats"]), batch_stats
    )

    y = model.apply({"params": merged_params, "batch_stats": merged_stats}, jnp.asarray(x), train=False)
    with torch.no_grad():
        ty = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(np.asarray(y), ty, rtol=1e-3, atol=1e-4)


def test_mvcnn_forward_shapes_and_state():
    m = MMTMMVCNN(nclasses=10, num_towers=2)
    x = jnp.zeros((2, 2, 32, 32, 3))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    assert set(variables.keys()) == {"params", "batch_stats", "mmtm"}
    (blend, logits, _, _), mut = m.apply(
        variables,
        x,
        jnp.asarray(False),
        jnp.asarray(0, jnp.int32),
        train=True,
        valid_mask=jnp.ones((2,)),
        mutable=["batch_stats", "mmtm"],
    )
    assert blend.shape == (2, 10)
    assert len(logits) == 2
    assert float(mut["mmtm"]["mmtm2"]["step"]) == 1.0
    np.testing.assert_allclose(
        np.asarray(blend), (np.asarray(logits[0]) + np.asarray(logits[1])) / 2, rtol=1e-6
    )


def test_mvcnn_three_modalities():
    m = MMTMMVCNN(nclasses=5, num_towers=3, modality_names=("rgb", "depth", "flow"), bug_compat=False)
    x = jnp.zeros((2, 3, 32, 32, 3))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    (blend, logits, _, _), _ = m.apply(
        variables, x, train=True, valid_mask=jnp.ones((2,)), mutable=["batch_stats", "mmtm"]
    )
    assert blend.shape == (2, 5)
    assert len(logits) == 3


def test_remat_trunk_equivalence():
    """remat=True changes memory behavior, not numerics."""
    m1 = MMTMMVCNN(nclasses=4, num_towers=2, remat=False)
    m2 = MMTMMVCNN(nclasses=4, num_towers=2, remat=True)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 2, 32, 32, 3))
    variables = m1.init(jax.random.PRNGKey(0), x, train=False)
    (b1, l1, _, _), _ = m1.apply(variables, x, train=True, valid_mask=jnp.ones((2,)), mutable=["batch_stats", "mmtm"])
    (b2, l2, _, _), _ = m2.apply(variables, x, train=True, valid_mask=jnp.ones((2,)), mutable=["batch_stats", "mmtm"])
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), rtol=1e-5, atol=1e-6)

    def loss(params, m):
        (blend, _, _, _), _ = m.apply({**variables, "params": params}, x, train=True, valid_mask=jnp.ones((2,)), mutable=["batch_stats", "mmtm"])
        return jnp.sum(blend ** 2)

    g1 = jax.grad(loss)(variables["params"], m1)
    g2 = jax.grad(loss)(variables["params"], m2)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_stem_s2d_equivalence():
    """stem_s2d=True computes conv1 as a 4×4 stride-1 conv over the 2×2
    space-to-depth input — same parameter tree, same numerics to float
    tolerance, forward and backward (resnet.StemConv)."""
    m1 = ResNet18Trunk(nclasses=4, stem_s2d=False)
    m2 = ResNet18Trunk(nclasses=4, stem_s2d=True)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 3))
    variables = m1.init(jax.random.PRNGKey(0), x, train=False)
    v2 = m2.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v2)
    assert variables["params"]["conv1"]["kernel"].shape == (7, 7, 3, 64)

    s1 = m1.apply(variables, x, False, method=ResNet18Trunk.stem)
    s2 = m2.apply(variables, x, False, method=ResNet18Trunk.stem)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-5)

    # backward through the stem: same cotangents for kernel and input
    def stem_sum_sq(params, m, inp):
        return jnp.sum(m.apply({"params": params, "batch_stats": variables["batch_stats"]},
                               inp, False, method=ResNet18Trunk.stem) ** 2)

    g1 = jax.grad(stem_sum_sq, argnums=(0, 2))(variables["params"], m1, x)
    g2 = jax.grad(stem_sum_sq, argnums=(0, 2))(variables["params"], m2, x)
    np.testing.assert_allclose(
        np.asarray(g1[0]["conv1"]["kernel"]), np.asarray(g2[0]["conv1"]["kernel"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), rtol=1e-4, atol=1e-5)

    # full fused model sanity: ~1e-6 stem deltas pass through 8 train-mode
    # BN+ReLU layers and MMTM sigmoids, so only loose agreement is a valid
    # expectation here (tight equivalence is pinned at the stem above)
    f1 = MMTMMVCNN(nclasses=4, num_towers=2, stem_s2d=False)
    f2 = MMTMMVCNN(nclasses=4, num_towers=2, stem_s2d=True)
    xs = jax.random.normal(jax.random.PRNGKey(5), (2, 2, 32, 32, 3))
    fv = f1.init(jax.random.PRNGKey(0), xs, train=False)

    def loss(params, m):
        (blend, _, _, _), _ = m.apply(
            {**fv, "params": params}, xs, train=True,
            valid_mask=jnp.ones((2,)), mutable=["batch_stats", "mmtm"],
        )
        return jnp.sum(blend ** 2)

    np.testing.assert_allclose(
        float(loss(fv["params"], f1)), float(loss(fv["params"], f2)), rtol=2e-2
    )

    # odd spatial dims are rejected (static shape check)
    with pytest.raises(ValueError, match="even spatial"):
        m2.apply(variables, jax.random.normal(jax.random.PRNGKey(1), (1, 31, 32, 3)), False,
                 method=ResNet18Trunk.stem)


def test_mmtm_seonly_matches_oracle(mmtm_setup):
    """SEonly: per-modality independent squeeze-excitation
    (reference src/balanced_mmtm.py:34-36,60-69)."""
    _, _, f0, f1 = mmtm_setup
    m = MMTM(dims=[8, 8], ratio=4.0, SEonly=True)
    variables = m.init(jax.random.PRNGKey(3), [jnp.asarray(f0), jnp.asarray(f1)])
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    (outs, scales, _), _ = m.apply(
        variables, [jnp.asarray(f0), jnp.asarray(f1)], return_scale=True, mutable=["mmtm"]
    )
    sq0 = f0.reshape(4, -1, 8).mean(1)
    e0 = sq0 @ p["fc_squeeze_visual"]["kernel"] + p["fc_squeeze_visual"]["bias"]
    g0 = _sigmoid(np.maximum(e0, 0) @ p["fc_visual"]["kernel"] + p["fc_visual"]["bias"])
    np.testing.assert_allclose(np.asarray(scales[0]), g0, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(outs[0]), f0 * g0[:, None, None, :], rtol=2e-5, atol=2e-6)


def test_mmtm_shareweight_single_excite(mmtm_setup):
    """shareweight: one shared excite FC for all modalities
    (reference src/balanced_mmtm.py:40-42,103-105)."""
    _, _, f0, f1 = mmtm_setup
    m = MMTM(dims=[8, 8], ratio=4.0, shareweight=True)
    variables = m.init(jax.random.PRNGKey(4), [jnp.asarray(f0), jnp.asarray(f1)])
    assert "fc_excite" in variables["params"]
    assert "fc_visual" not in variables["params"]
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    (_, scales, _), _ = m.apply(
        variables, [jnp.asarray(f0), jnp.asarray(f1)], return_scale=True, mutable=["mmtm"]
    )
    sq = np.concatenate([f0.reshape(4, -1, 8).mean(1), f1.reshape(4, -1, 8).mean(1)], 1)
    e = np.maximum(sq @ p["fc_squeeze"]["kernel"] + p["fc_squeeze"]["bias"], 0)
    g = _sigmoid(e @ p["fc_excite"]["kernel"] + p["fc_excite"]["bias"])
    np.testing.assert_allclose(np.asarray(scales[0]), g, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(scales[1]), g, rtol=2e-5, atol=2e-6)
