"""MMTM_MVCNN.pretraining=True with local torchvision-format weights
(reference: src/model.py:53-56 — resnet18(pretrained=True) trunks with the
fc head replaced).  torchvision itself is unavailable here, so the fixture
synthesizes a state_dict with torchvision resnet18's exact keys/shapes."""

import os

import numpy as np
import pytest

from greedy_multimodal_learning_tpu import config as cfg


def synth_resnet18_state_dict(rng):
    """All torchvision resnet18 keys (ImageNet head: fc is 1000-way)."""
    sd = {}

    def conv(name, cout, cin, k):
        sd[f"{name}.weight"] = rng.normal(0, 0.05, (cout, cin, k, k)).astype(np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = rng.normal(1, 0.05, (c,)).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(0, 0.05, (c,)).astype(np.float32)
        sd[f"{name}.running_mean"] = rng.normal(0, 0.05, (c,)).astype(np.float32)
        sd[f"{name}.running_var"] = np.abs(rng.normal(1, 0.05, (c,))).astype(np.float32)
        sd[f"{name}.num_batches_tracked"] = np.asarray(0, np.int64)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    widths = [64, 128, 256, 512]
    cin = 64
    for li, w in enumerate(widths, start=1):
        for b in range(2):
            c_in = cin if b == 0 else w
            conv(f"layer{li}.{b}.conv1", w, c_in, 3)
            bn(f"layer{li}.{b}.bn1", w)
            conv(f"layer{li}.{b}.conv2", w, w, 3)
            bn(f"layer{li}.{b}.bn2", w)
            if b == 0 and c_in != w:
                conv(f"layer{li}.{b}.downsample.0", w, c_in, 1)
                bn(f"layer{li}.{b}.downsample.1", w)
        cin = w
    sd["fc.weight"] = rng.normal(0, 0.05, (1000, 512)).astype(np.float32)
    sd["fc.bias"] = np.zeros((1000,), np.float32)
    return sd


@pytest.fixture
def weights_file(tmp_path):
    import torch

    sd = {k: torch.from_numpy(np.array(v)) for k, v in synth_resnet18_state_dict(np.random.default_rng(3)).items()}
    path = str(tmp_path / "resnet18-imagenet.pt")
    torch.save(sd, path)
    return path


def test_apply_pretrained_trunks(weights_file):
    import jax
    import jax.numpy as jnp

    from greedy_multimodal_learning_tpu.engine import create_train_state, make_optimizer
    from greedy_multimodal_learning_tpu.models import MMTMMVCNN, apply_pretrained_trunks

    model = MMTMMVCNN(nclasses=4, num_towers=2)
    opt = make_optimizer(lr=0.1)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), jnp.zeros((2, 2, 32, 32, 3)))
    fresh_fc = np.asarray(state.params["net_view_0"]["fc"]["kernel"]).copy()

    new = apply_pretrained_trunks(state, weights_file, 2)

    sd = synth_resnet18_state_dict(np.random.default_rng(3))
    want_conv1 = np.transpose(sd["conv1.weight"], (2, 3, 1, 0))  # OIHW -> HWIO
    for tower in ("net_view_0", "net_view_1"):
        np.testing.assert_allclose(np.asarray(new.params[tower]["conv1"]["kernel"]), want_conv1)
        np.testing.assert_allclose(np.asarray(new.batch_stats[tower]["bn1"]["mean"]), sd["bn1.running_mean"])
        np.testing.assert_allclose(
            np.asarray(new.params[tower]["layer2_0"]["downsample_conv"]["kernel"]),
            np.transpose(sd["layer2.0.downsample.0.weight"], (2, 3, 1, 0)),
        )
    # fc head (1000-way in the file) untouched: stays freshly initialized
    np.testing.assert_allclose(np.asarray(new.params["net_view_0"]["fc"]["kernel"]), fresh_fc)
    # MMTM params untouched
    np.testing.assert_allclose(
        np.asarray(new.params["mmtm2"]["fc_squeeze"]["kernel"]),
        np.asarray(state.params["mmtm2"]["fc_squeeze"]["kernel"]),
    )


def test_pretraining_cli_end_to_end(tmp_path, weights_file):
    """Full train run through the entry point with pretraining=True."""
    from greedy_multimodal_learning_tpu.data.synthetic import make_synthetic_modelnet
    from train import train

    root = make_synthetic_modelnet(str(tmp_path / "d"), n_train=8, n_test=4, num_views=2, image_size=32, nclasses=4)
    save = str(tmp_path / "run")
    os.makedirs(save)
    cfg.parse_config(
        f"""
        MMTM_MVCNN.num_views = 2
        MMTM_MVCNN.nclasses = 4
        MMTM_MVCNN.pretraining = True
        MMTM_MVCNN.pretrained_weights_path = '{weights_file}'
        get_mvdcndata.root_dir = '{root}'
        get_mvdcndata.specific_views = [0, 1]
        train.batch_size = 4
        training_loop.n_epochs = 2
        """
    )
    train(save)
    assert os.path.exists(os.path.join(save, "history.csv"))


def test_pretraining_without_weights_raises():
    from greedy_multimodal_learning_tpu.models import build_model_from_config

    cfg.parse_config("MMTM_MVCNN.pretraining = True")
    os.environ.pop("GML_PRETRAINED_RESNET18", None)
    with pytest.raises(NotImplementedError, match="pretrained_weights_path"):
        build_model_from_config()


def test_pretraining_missing_file_raises(tmp_path):
    from greedy_multimodal_learning_tpu.models import build_model_from_config

    cfg.parse_config(
        f"MMTM_MVCNN.pretraining = True\nMMTM_MVCNN.pretrained_weights_path = '{tmp_path}/nope.pt'"
    )
    with pytest.raises(FileNotFoundError):
        build_model_from_config()
