"""Full-model parity vs an independent torch oracle.

Builds the two-tower ResNet-18 + MMTM model in torch with the reference's
semantics (running-average gates incl. the bug_compat update order,
curation substitution, blend loss — reference: src/model.py,
src/balanced_mmtm.py, train.py:23-29), loads the *same* weights through the
reverse checkpoint converter, and compares one full training forward+backward:
logits, loss, every parameter gradient, BN running-stat updates, and MMTM
running-average state.  This is the ±0.5% parity foundation (BASELINE.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from greedy_multimodal_learning_tpu.engine.checkpoint import pytrees_to_state_dict
from greedy_multimodal_learning_tpu.engine.metrics import blend_loss
from greedy_multimodal_learning_tpu.models import MMTMMVCNN
from greedy_multimodal_learning_tpu.utils.torch_compat import state_dict_to_pytrees

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

B, IMG, NC = 4, 64, 8


class _TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False), tnn.BatchNorm2d(cout)
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.relu(out + idt)


class _TorchResNet18(tnn.Module):
    def __init__(self, nclasses):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        cin = 64
        for li, w in enumerate([64, 128, 256, 512]):
            s = 1 if li == 0 else 2
            setattr(self, f"layer{li + 1}", tnn.Sequential(_TorchBasicBlock(cin, w, s), _TorchBasicBlock(w, w, 1)))
            cin = w
        self.fc = tnn.Linear(512, nclasses)

    def stem(self, x):
        return self.maxpool(torch.relu(self.bn1(self.conv1(x))))


class _TorchMMTM(tnn.Module):
    """Torch oracle of the reference MMTM semantics
    (src/balanced_mmtm.py:16-154), including the skeleton-running-average
    copy-paste bug (bug_compat)."""

    def __init__(self, dim, ratio=4):
        super().__init__()
        dim_out = int(2 * (2 * dim) / ratio)
        self.fc_squeeze = tnn.Linear(2 * dim, dim_out)
        self.fc_visual = tnn.Linear(dim_out, dim)
        self.fc_skeleton = tnn.Linear(dim_out, dim)
        self.running_avg_visual = torch.zeros(dim)
        self.running_avg_skeleton = torch.zeros(dim)
        self.step = 0

    def forward(self, a, b, curation_mode=False, caring_modality=0):
        sa = a.flatten(2).mean(-1)
        sb = b.flatten(2).mean(-1)
        e = torch.relu(self.fc_squeeze(torch.cat([sa, sb], 1)))
        ga = torch.sigmoid(self.fc_visual(e))
        gb = torch.sigmoid(self.fc_skeleton(e))
        self.running_avg_visual = ((ga.mean(0) + self.running_avg_visual * self.step) / (self.step + 1)).detach()
        self.running_avg_skeleton = ((ga.mean(0) + self.running_avg_skeleton * self.step) / (self.step + 1)).detach()
        self.step += 1
        eff_a, eff_b = ga, gb
        if curation_mode and caring_modality == 0:
            eff_a = self.running_avg_visual.expand_as(ga)
        if curation_mode and caring_modality == 1:
            eff_b = self.running_avg_skeleton.expand_as(gb)
        return a * eff_a[:, :, None, None], b * eff_b[:, :, None, None], (ga, gb)


class _TorchTwoTower(tnn.Module):
    def __init__(self, nclasses):
        super().__init__()
        self.net_view_0 = _TorchResNet18(nclasses)
        self.net_view_1 = _TorchResNet18(nclasses)
        self.mmtm2 = _TorchMMTM(128)
        self.mmtm3 = _TorchMMTM(256)
        self.mmtm4 = _TorchMMTM(512)

    def forward(self, x, curation_mode=False, caring_modality=0):
        a = self.net_view_0.layer1(self.net_view_0.stem(x[:, 0]))
        b = self.net_view_1.layer1(self.net_view_1.stem(x[:, 1]))
        gates = []
        for li in (2, 3, 4):
            a = getattr(self.net_view_0, f"layer{li}")(a)
            b = getattr(self.net_view_1, f"layer{li}")(b)
            a, b, g = getattr(self, f"mmtm{li}")(a, b, curation_mode, caring_modality)
            gates.append(g)
        la = self.net_view_0.fc(a.mean((2, 3)))
        lb = self.net_view_1.fc(b.mean((2, 3)))
        return la, lb, gates


@pytest.fixture(scope="module")
def parity_setup():
    jax_model = MMTMMVCNN(nclasses=NC, num_towers=2)
    x = np.random.default_rng(0).normal(size=(B, 2, IMG, IMG, 3)).astype(np.float32)
    variables = jax_model.init(jax.random.PRNGKey(1), jnp.asarray(x), train=False)

    tmodel = _TorchTwoTower(NC)
    sd = pytrees_to_state_dict(variables["params"], variables["batch_stats"])
    missing, unexpected = tmodel.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}, strict=False
    )
    # only torch-internal bookkeeping may be missing
    assert all("num_batches_tracked" in m for m in missing), missing
    assert not unexpected, unexpected
    y = np.random.default_rng(1).integers(0, NC, (B,)).astype(np.int64)
    return jax_model, variables, tmodel, x, y


def test_one_train_step_matches_torch(parity_setup):
    jax_model, variables, tmodel, x, y = parity_setup
    mask = jnp.ones((B,))

    def loss_fn(params):
        (blend, logits, _, _), mut = jax_model.apply(
            {**variables, "params": params},
            jnp.asarray(x),
            jnp.asarray(False),
            jnp.asarray(0, jnp.int32),
            train=True,
            valid_mask=mask,
            mutable=["batch_stats", "mmtm"],
        )
        return blend_loss(logits, jnp.asarray(y.astype(np.int32)), mask), (logits, mut)

    (jloss, (jlogits, mut)), jgrads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])

    tmodel.train()
    tx = torch.from_numpy(x).permute(0, 1, 4, 2, 3)
    la, lb, gates = tmodel(tx)
    tloss = tnn.CrossEntropyLoss()(la, torch.from_numpy(y)) + tnn.CrossEntropyLoss()(lb, torch.from_numpy(y))
    tloss.backward()

    np.testing.assert_allclose(np.asarray(jlogits[0]), la.detach().numpy(), rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(jlogits[1]), lb.detach().numpy(), rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(float(jloss), float(tloss), rtol=1e-4)

    # every parameter gradient matches through the name mapping; compared in
    # relative Frobenius norm (elementwise comparison of gradients 18 layers
    # deep is dominated by f32 reduction-order noise — measured worst leaf
    # agrees to 0.6%).
    tgrads = {name: p.grad for name, p in tmodel.named_parameters() if p.grad is not None}
    gp, _ = state_dict_to_pytrees(tgrads)

    def compare(jt, tt, path=""):
        if isinstance(jt, dict):
            for k in tt:
                assert k in jt, f"missing grad {path}/{k}"
                compare(jt[k], tt[k], path + "/" + k)
        else:
            a, b = np.asarray(jt), np.asarray(tt)
            rel = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)
            assert rel < 2e-2, f"{path}: grad norm rel err {rel:.3e}"

    compare(jgrads, gp)

    # BN running stats updated identically (spot check both towers)
    for tower in ("net_view_0", "net_view_1"):
        tbn = dict(tmodel.named_buffers())[f"{tower}.bn1.running_mean"].numpy()
        np.testing.assert_allclose(
            np.asarray(mut["batch_stats"][tower]["bn1"]["mean"]), tbn, rtol=1e-4, atol=1e-5
        )

    # MMTM running-average state matches (incl. bug_compat semantics)
    for li in (2, 3, 4):
        tm = getattr(tmodel, f"mmtm{li}")
        np.testing.assert_allclose(
            np.asarray(mut["mmtm"][f"mmtm{li}"]["running_avg_visual"]),
            tm.running_avg_visual.numpy(),
            rtol=1e-3,
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(mut["mmtm"][f"mmtm{li}"]["running_avg_skeleton"]),
            tm.running_avg_skeleton.numpy(),
            rtol=1e-3,
            atol=1e-5,
        )


def test_curation_forward_matches_torch(parity_setup):
    jax_model, variables, tmodel, x, y = parity_setup
    import copy

    tm = copy.deepcopy(tmodel)
    # reset MMTM running-average state (the module-scope model already ran
    # one forward in the previous test; the jax variables are fresh)
    for li in (2, 3, 4):
        m = getattr(tm, f"mmtm{li}")
        m.step = 0
        m.running_avg_visual = torch.zeros_like(m.running_avg_visual)
        m.running_avg_skeleton = torch.zeros_like(m.running_avg_skeleton)
    tm.train()
    tx = torch.from_numpy(x).permute(0, 1, 4, 2, 3)
    with torch.no_grad():
        la, lb, _ = tm(tx, curation_mode=True, caring_modality=1)

    (blend, jlogits, _, _), _ = jax_model.apply(
        variables,
        jnp.asarray(x),
        jnp.asarray(True),
        jnp.asarray(1, jnp.int32),
        train=True,
        valid_mask=jnp.ones((B,)),
        mutable=["batch_stats", "mmtm"],
    )
    np.testing.assert_allclose(np.asarray(jlogits[0]), la.numpy(), rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(jlogits[1]), lb.numpy(), rtol=5e-3, atol=5e-4)
