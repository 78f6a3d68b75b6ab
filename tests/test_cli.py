"""The verbatim CLI surface: ``python3 train.py SAVE_PATH CONFIG [BINDINGS]``
with '#'-separated config mixins and bindings (reference: README.md:14-23,
src/utils.py:58-68), exercised through real subprocesses."""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

from greedy_multimodal_learning_tpu.data.synthetic import make_synthetic_modelnet

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd=REPO):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    # This image's sitecustomize force-registers a remote TPU backend when
    # PALLAS_AXON_POOL_IPS is set, overriding JAX_PLATFORMS; drop it so the
    # subprocess runs hermetically on CPU.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run([sys.executable] + args, cwd=cwd, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, f"STDOUT:\n{r.stdout[-3000:]}\nSTDERR:\n{r.stderr[-3000:]}"
    return r


@pytest.mark.slow
def test_train_cli_end_to_end(tmp_path):
    root = make_synthetic_modelnet(str(tmp_path / "data"), n_train=8, n_test=4, num_views=2, image_size=32)
    save = str(tmp_path / "run")
    bindings = "#".join(
        [
            "MMTM_MVCNN.nclasses=4",
            f"get_mvdcndata.root_dir='{root}'",
            "get_mvdcndata.specific_views=[0, 1]",
            "train.batch_size=4",
            "training_loop.n_epochs=2",
        ]
    )
    _run(["train.py", save, "configs/training_random.gin", bindings])

    # artifacts: history, checkpoints, stdout tee, operative config
    df = pd.read_csv(os.path.join(save, "history.csv"))
    assert df["epoch"].tolist() == [1]
    assert os.path.exists(os.path.join(save, "model_best_val.pt"))
    assert os.path.exists(os.path.join(save, "model_last_epoch.pt"))
    assert os.path.exists(os.path.join(save, "stdout.txt"))
    assert os.path.exists(os.path.join(save, "stderr.txt"))
    assert os.path.exists(os.path.join(save, "operative_config.gin"))
    with open(os.path.join(save, "history.pickle"), "rb") as f:
        H = pickle.load(f)
    assert "train_indices" in H


def test_config_mixins_cli(tmp_path):
    """Two '#'-separated configs: later mixin overrides earlier bindings."""
    c1 = tmp_path / "a.gin"
    c1.write_text("train.batch_size=4\ntrain.lr=0.1\n")
    c2 = tmp_path / "b.gin"
    c2.write_text("train.lr=0.5\n")

    from greedy_multimodal_learning_tpu import config as cfg

    cfg.clear_config()
    cfg.parse_config_files_and_bindings(f"{c1}#{c2}".split("#"), "")
    assert cfg.query("train", "batch_size") == 4
    assert cfg.query("train", "lr") == 0.5
    cfg.clear_config()


def test_analysis_reads_torch_format_pickles(tmp_path):
    """get_mmtm_outputs / get_rescale_weights must consume history pickles
    produced by the reference (torch tensors inside), reference:
    src/balanced_mmtm.py:157-206."""
    torch = pytest.importorskip("torch")
    from greedy_multimodal_learning_tpu.analysis import get_rescale_weights

    n, C = 6, 4
    rng = np.random.default_rng(0)
    full = [rng.normal(size=(n, C * (2 ** i))).astype(np.float32) for i in range(3)]  # 3 mmtm positions

    # recording-run pickle: batches of torch tensors in shuffled order
    order = np.asarray([3, 1, 5, 0, 2, 4])
    batches = []
    for s in range(0, n, 2):
        rows = order[s : s + 2]
        batches.append(
            [[torch.from_numpy(full[m][rows]), torch.from_numpy(full[m][rows] * 2)] for m in range(3)]
        )
    eval_dir = tmp_path / "eval_history_batch"
    eval_dir.mkdir()
    with open(eval_dir / "history.pickle", "wb") as f:
        pickle.dump({"test_squeezedmaps_array_list": [batches], "test_indices": [order]}, f)

    # training-run pickle with train indices
    train_idx = np.asarray([0, 2, 4])
    with open(tmp_path / "history.pickle", "wb") as f:
        pickle.dump({"train_indices": [train_idx], "val_indices": [np.asarray([1, 3])]}, f)

    weights = get_rescale_weights(str(eval_dir), str(tmp_path))
    assert weights[0] is None
    for m in range(3):
        expected_v0 = full[m][train_idx].mean(0)
        np.testing.assert_allclose(weights[m + 1][0], expected_v0, rtol=1e-6)
        np.testing.assert_allclose(weights[m + 1][1], expected_v0 * 2, rtol=1e-6)


@pytest.mark.slow
def test_eval_cli_end_to_end(tmp_path):
    """Train via CLI, then run the recording eval via CLI (the reference's
    two-step workflow, README.md:20-23)."""
    root = make_synthetic_modelnet(str(tmp_path / "data"), n_train=6, n_test=4, num_views=2, image_size=32)
    save = str(tmp_path / "run")
    common = [
        "MMTM_MVCNN.nclasses=4",
        f"get_mvdcndata.root_dir='{root}'",
        "get_mvdcndata.specific_views=[0, 1]",
    ]
    _run(
        ["train.py", save, "configs/training_random.gin",
         "#".join(common + ["train.batch_size=4", "training_loop.n_epochs=2"])]
    )
    _run(
        ["eval.py", save, "configs/recording.gin",
         "#".join(common + [
             "eval_.batch_size=4",
             f"eval_.pretrained_weights_path='{os.path.join(save, 'model_best_val.pt')}'",
         ])]
    )
    rec = os.path.join(save, "eval_history_batch", "history.pickle")
    assert os.path.exists(rec)
    with open(rec, "rb") as f:
        H = pickle.load(f)
    assert "test_squeezedmaps_array_list" in H
    assert len(H["test_indices"][0]) == 6
