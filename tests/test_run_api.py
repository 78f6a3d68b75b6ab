"""run_api.run_entry — the in-process equivalent of the CLI surface.

Pins the contract the experiment drivers rely on: chaining
train → recording → flow-off in ONE process through run_entry produces
artifacts identical to three fresh ``train.py``/``eval.py`` subprocesses
(reference pipeline: README.md:14-23)."""

import os
import pickle
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

from greedy_multimodal_learning_tpu.data.synthetic import make_synthetic_modelnet
from greedy_multimodal_learning_tpu.run_api import run_entry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [sys.executable] + args, cwd=REPO, env=env, capture_output=True, text=True, timeout=600
    )
    assert r.returncode == 0, f"STDOUT:\n{r.stdout[-3000:]}\nSTDERR:\n{r.stderr[-3000:]}"


def _phases(save, root, seed=7, epochs=3):
    common = "#".join(
        [
            "MMTM_MVCNN.nclasses=4",
            f"get_mvdcndata.root_dir='{root}'",
            "get_mvdcndata.specific_views=[0, 1]",
            "get_mvdcndata.num_workers=0",
            f"get_mvdcndata.seed={seed}",
            "train.batch_size=4",
            f"train.seed={seed}",
            f"training_loop.n_epochs={epochs}",
        ]
    )
    ckpt = os.path.join(save, "model_best_val.pt")
    rec = "#".join(
        [
            f"eval_.pretrained_weights_path='{ckpt}'",
            "MMTM_MVCNN.nclasses=4",
            f"get_mvdcndata.root_dir='{root}'",
            "get_mvdcndata.specific_views=[0, 1]",
            "get_mvdcndata.num_workers=0",
            "eval_.batch_size=4",
        ]
    )
    off = rec + "#".join(
        [
            "",
            f"MMTM_MVCNN.mmtm_rescale_eval_file_path='{os.path.join(save, 'eval_history_batch')}'",
            f"MMTM_MVCNN.mmtm_rescale_training_file_path='{save}'",
        ]
    )
    return [
        ("train", save, "configs/training_guided.gin", common),
        ("eval", save, "configs/recording.gin", rec),
        ("eval", os.path.join(save, "mmtm_off_eval"), "configs/eval.gin", off),
    ]


@pytest.mark.slow
def test_in_process_pipeline_matches_subprocess_cli(tmp_path):
    root = make_synthetic_modelnet(
        str(tmp_path / "data"), n_train=16, n_test=8, num_views=2, image_size=32
    )

    # chain A: three fresh subprocesses (the reference's driving mode)
    save_a = str(tmp_path / "cli")
    for entry, save, config, bindings in _phases(save_a, root):
        script = {"train": "train.py", "eval": "eval.py"}[entry]
        _run_cli([script, save, config, bindings])

    # chain B: one process, three run_entry calls.  Run it in a subprocess
    # with the SAME env as chain A (single CPU device) — the contract is
    # run_entry ≡ CLI under an identical backend; the surrounding test
    # harness's 8-virtual-device XLA_FLAGS would change the trajectory.
    save_b = str(tmp_path / "api")
    phases_b = _phases(save_b, root)
    driver = (
        "import sys; from greedy_multimodal_learning_tpu.run_api import run_entry\n"
        "import json\n"
        "for entry, save, config, bindings in json.loads(sys.argv[1]):\n"
        "    run_entry(entry, save, config, bindings)\n"
    )
    import json

    _run_cli(["-c", driver, json.dumps(phases_b)])

    # training history: identical trajectories
    ha = pd.read_csv(os.path.join(save_a, "history.csv"))
    hb = pd.read_csv(os.path.join(save_b, "history.csv"))
    assert list(ha.columns) == list(hb.columns)
    for col in ha.columns:
        a, b = ha[col].to_numpy(), hb[col].to_numpy()
        if np.issubdtype(a.dtype, np.floating):
            if col.endswith("time") or "per_sec" in col:
                continue  # wall-clock-derived columns legitimately differ
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6, err_msg=col)
        else:
            assert (a == b).all(), col

    # recording phase: same sample order and squeeze maps
    with open(os.path.join(save_a, "eval_history_batch", "history.pickle"), "rb") as f:
        ra = pickle.load(f)
    with open(os.path.join(save_b, "eval_history_batch", "history.pickle"), "rb") as f:
        rb = pickle.load(f)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(x).ravel() for x in ra["test_indices"]]),
        np.concatenate([np.asarray(x).ravel() for x in rb["test_indices"]]),
    )
    def _leaves(x):
        # per-batch entries are [mmtm][view] arrays with per-mmtm channel
        # widths (128/256/512) — ragged, so flatten to leaf arrays
        if isinstance(x, (list, tuple)):
            for y in x:
                yield from _leaves(y)
        else:
            yield np.asarray(x)

    sa = list(_leaves(ra["test_squeezedmaps_array_list"]))
    sb = list(_leaves(rb["test_squeezedmaps_array_list"]))
    assert len(sa) == len(sb)
    for ma, mb in zip(sa, sb):
        np.testing.assert_allclose(ma, mb, rtol=1e-5, atol=1e-6)

    # flow-off phase: identical conditional-utilization metrics
    oa = pd.read_csv(os.path.join(save_a, "mmtm_off_eval", "eval_history_batch", "history.csv")).iloc[-1]
    ob = pd.read_csv(os.path.join(save_b, "mmtm_off_eval", "eval_history_batch", "history.csv")).iloc[-1]
    for col in ("test_acc", "test_acc_modal_0", "test_acc_modal_1"):
        np.testing.assert_allclose(oa[col], ob[col], rtol=1e-5, atol=1e-6, err_msg=col)


def test_run_entry_clears_bindings(tmp_path):
    """Bindings from one phase must not leak into the next caller."""
    from greedy_multimodal_learning_tpu import config as cfg

    root = make_synthetic_modelnet(
        str(tmp_path / "data"), n_train=8, n_test=4, num_views=2, image_size=32
    )
    save = str(tmp_path / "run")
    run_entry(
        "train",
        save,
        "configs/training_random.gin",
        "#".join(
            [
                "MMTM_MVCNN.nclasses=4",
                f"get_mvdcndata.root_dir='{root}'",
                "get_mvdcndata.specific_views=[0, 1]",
                "train.batch_size=4",
                "training_loop.n_epochs=2",
            ]
        ),
    )
    assert cfg.query("train", "batch_size") is None
    assert os.path.exists(os.path.join(save, "history.csv"))
    assert os.path.exists(os.path.join(save, "operative_config.gin"))
    assert os.path.exists(os.path.join(save, "stdout.txt"))

    with pytest.raises(ValueError):
        run_entry("predict", save, "configs/training_random.gin")


def test_run_entry_clears_bindings_on_parse_error(tmp_path):
    """A malformed bindings string must not leak already-applied lines into
    the caller's next phase."""
    from greedy_multimodal_learning_tpu import config as cfg

    with pytest.raises(Exception):
        run_entry(
            "train",
            str(tmp_path / "bad"),
            "configs/training_random.gin",
            "train.batch_size=4#this is not a binding",
        )
    assert cfg.query("train", "batch_size") is None


def test_run_phase_rejects_env_extra_in_process(tmp_path):
    """Backend-selecting env vars cannot apply once jax is initialized."""
    import sys as _sys

    _sys.path.insert(0, os.path.join(REPO, "tools"))
    from driver_common import run_phase

    with pytest.raises(ValueError, match="env_extra"):
        run_phase(
            "train", str(tmp_path / "r"), "configs/training_random.gin", "",
            str(tmp_path / "r.log"), in_process=True,
            env_extra={"JAX_PLATFORMS": "cpu"},
        )
