"""Fused multi-checkpoint eval sweep: vmapped results must equal
per-checkpoint sequential evaluation."""

import numpy as np

import jax
import jax.numpy as jnp

from greedy_multimodal_learning_tpu.data import BatchPipeline, MultiviewModelNet
from greedy_multimodal_learning_tpu.data.synthetic import make_synthetic_modelnet
from greedy_multimodal_learning_tpu.engine import Trainer, create_train_state, make_optimizer
from greedy_multimodal_learning_tpu.engine.sweep import eval_sweep
from greedy_multimodal_learning_tpu.models import MMTMMVCNN


def test_eval_sweep_matches_sequential(tmp_path):
    root = make_synthetic_modelnet(str(tmp_path), n_train=6, n_test=6, num_views=2, image_size=32)
    ds = MultiviewModelNet(root, "test", specific_view=[0, 1])

    model = MMTMMVCNN(nclasses=4, num_towers=2)
    optimizer = make_optimizer(lr=0.1)
    sample = jnp.zeros((4, 2, 32, 32, 3), jnp.float32)
    s1 = create_train_state(model, optimizer, jax.random.PRNGKey(0), sample)
    s2 = create_train_state(model, optimizer, jax.random.PRNGKey(1), sample)

    trees = [
        {"params": s.params, "batch_stats": s.batch_stats, "mmtm": s.mmtm} for s in (s1, s2)
    ]
    pipe = BatchPipeline(ds, range(6), batch_size=4, shuffle=False)
    swept = eval_sweep(model, trees, pipe)
    assert len(swept) == 2

    # sequential reference via the Trainer's eval path
    for s, res in zip((s1, s2), swept):
        tr = Trainer(model=model, optimizer=optimizer, state=s)
        seq = tr._eval_generator(BatchPipeline(ds, range(6), batch_size=4, shuffle=False), "test")
        np.testing.assert_allclose(res["loss"], seq["test_loss"], rtol=1e-5)
        np.testing.assert_allclose(res["acc"], seq["test_acc"], rtol=1e-5)
        np.testing.assert_allclose(res["acc_modal_0"], seq["test_acc_modal_0"], rtol=1e-5)
    # different checkpoints yield different numbers (sanity)
    assert swept[0]["loss"] != swept[1]["loss"]


def test_eval_sweep_cli(tmp_path):
    """eval_sweep.py entry: K checkpoints -> sweep.csv in one data pass."""
    import os
    import subprocess
    import sys

    from greedy_multimodal_learning_tpu.data.synthetic import make_synthetic_modelnet

    root = make_synthetic_modelnet(str(tmp_path / "d"), n_train=8, n_test=6, num_views=2, image_size=32, nclasses=4)
    run = str(tmp_path / "run")
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.join(os.path.dirname(__file__), "..")
    bindings = (
        f"get_mvdcndata.root_dir='{root}'#get_mvdcndata.specific_views=[0, 1]"
        f"#MMTM_MVCNN.nclasses=4#train.batch_size=4#training_loop.n_epochs=2"
    )
    r = subprocess.run([sys.executable, "train.py", run, "configs/training_random.gin", bindings],
                       cwd=repo, env=env, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-800:]

    out = str(tmp_path / "sweep")
    sb = (
        f"eval_sweep_.checkpoints=['{run}/model_best_val.pt', '{run}/model_last_epoch.pt']"
        f"#eval_sweep_.batch_size=4"
        f"#get_mvdcndata.root_dir='{root}'#get_mvdcndata.specific_views=[0, 1]#MMTM_MVCNN.nclasses=4"
    )
    r = subprocess.run([sys.executable, "eval_sweep.py", out, "configs/training_random.gin", sb],
                       cwd=repo, env=env, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-800:]

    import pandas as pd

    df = pd.read_csv(os.path.join(out, "sweep.csv"))
    assert len(df) == 2  # one row per checkpoint
    assert {"checkpoint", "loss", "acc", "acc_modal_0", "acc_modal_1"} <= set(df.columns)
    assert df["acc"].between(0, 100).all()
