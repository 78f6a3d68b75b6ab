"""Inference API: Trainer.predict returns per-sample predictions in dataset
order with calibrated probabilities, and bf16 compute runs end to end."""

import numpy as np

import jax
import jax.numpy as jnp

from greedy_multimodal_learning_tpu.data import BatchPipeline, MultiviewModelNet
from greedy_multimodal_learning_tpu.data.synthetic import make_synthetic_modelnet
from greedy_multimodal_learning_tpu.engine import Trainer, create_train_state, make_optimizer
from greedy_multimodal_learning_tpu.models import MMTMMVCNN


def _make(tmp_path, dtype=jnp.float32):
    root = make_synthetic_modelnet(str(tmp_path), n_train=6, n_test=5, num_views=2, image_size=32)
    ds = MultiviewModelNet(root, "test", specific_view=[0, 1])
    pipe = BatchPipeline(ds, range(5), batch_size=4, shuffle=False)
    model = MMTMMVCNN(nclasses=4, num_towers=2, dtype=dtype)
    optimizer = make_optimizer(lr=0.1)
    sample = jnp.zeros((4, 2, 32, 32, 3), jnp.float32)
    state = create_train_state(model, optimizer, jax.random.PRNGKey(0), sample)
    return model, optimizer, state, pipe


def test_predict_outputs(tmp_path):
    model, optimizer, state, pipe = _make(tmp_path)
    trainer = Trainer(model=model, optimizer=optimizer, state=state)
    out = trainer.predict(pipe)
    assert out["indices"].tolist() == [0, 1, 2, 3, 4]
    assert out["predictions"].shape == (5,)
    assert out["probabilities"].shape == (5, 4)
    np.testing.assert_allclose(out["probabilities"].sum(axis=1), 1.0, rtol=1e-5)
    assert len(out["logits"]) == 2
    assert out["logits"][0].shape == (5, 4)


def test_bf16_end_to_end(tmp_path):
    from greedy_multimodal_learning_tpu.engine.controller import init_controller_state

    model, optimizer, state, pipe = _make(tmp_path, dtype=jnp.bfloat16)
    trainer = Trainer(model=model, optimizer=optimizer, state=state, controller_kind="guided",
                      controller_config=dict(epsilon=0.01, curation_windowsize=3))
    out = trainer.predict(pipe)
    assert np.isfinite(out["probabilities"]).all()
    # one bf16 train step through the jitted path
    from greedy_multimodal_learning_tpu.engine.framework import _get_step_iterator

    batch = next(iter(pipe))
    batch.pop("size")
    batch.pop("indices")
    state2, step_out = trainer._train_step(trainer.state, batch, jnp.asarray(True))
    assert np.isfinite(float(step_out["loss"]))
    # params stay f32 under bf16 compute
    assert jax.tree_util.tree_leaves(state2.params)[0].dtype == jnp.float32

def test_predict_cli_writes_predictions_csv(tmp_path):
    """predict.py entry point: checkpoint -> predictions.csv (serving)."""
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

    out = str(tmp_path / "preds")
    pb = (
        f"predict_.pretrained_weights_path='{run}/model_best_val.pt'#predict_.batch_size=4"
        f"#get_mvdcndata.root_dir='{root}'#get_mvdcndata.specific_views=[0, 1]#MMTM_MVCNN.nclasses=4"
    )
    r = subprocess.run([sys.executable, "predict.py", out, "configs/training_random.gin", pb],
                       cwd=repo, env=env, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-800:]

    import pandas as pd

    df = pd.read_csv(os.path.join(out, "predictions.csv"))
    assert list(df.columns) == ["index", "model", "true_class", "predicted_class", "confidence"]
    assert len(df) == 6  # full test split, padded rows trimmed
    assert df["confidence"].between(0, 1).all()
    assert sorted(df["index"]) == list(range(6))


def test_predict_honors_mmtm_off(tmp_path):
    """An ablation Trainer (mmtm_off + average squeeze maps) must predict
    through the same network configuration its eval metrics come from."""
    model, optimizer, state, pipe = _make(tmp_path)
    rng = np.random.default_rng(0)
    # get_rescale_weights structure: 4 mmtm positions, index 0 unused
    avg_maps = [None] + [
        [rng.normal(size=(c,)).astype(np.float32) for _ in range(2)] for c in (128, 256, 512)
    ]
    tr_on = Trainer(model=model, optimizer=optimizer, state=state)
    tr_off = Trainer(
        model=model, optimizer=optimizer, state=state,
        mmtm_off=True, average_squeezemaps=avg_maps,
    )
    out_on = tr_on.predict(BatchPipeline(pipe.dataset, range(5), batch_size=4, shuffle=False))
    out_off = tr_off.predict(BatchPipeline(pipe.dataset, range(5), batch_size=4, shuffle=False))
    # cutting cross-modal flow changes the gates, so the logits must differ
    assert not np.allclose(out_on["logits"][0], out_off["logits"][0])

    # and the mmtm_off predict path must equal a direct mmtm_off forward
    batch = next(iter(BatchPipeline(pipe.dataset, range(5), batch_size=4, shuffle=False)))
    from greedy_multimodal_learning_tpu.data.transforms import preprocess

    x = preprocess(batch["images"], train=False, dtype=model.dtype)
    (blend, logits, _, _), _ = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats, "mmtm": state.mmtm},
        x,
        train=False,
        valid_mask=jnp.asarray(batch["mask"]),
        mmtm_off=True,
        average_squeezemaps=avg_maps,
        mutable=["mmtm"],
    )
    np.testing.assert_allclose(out_off["logits"][0][:4], np.asarray(logits[0])[:4], rtol=1e-5, atol=1e-5)
