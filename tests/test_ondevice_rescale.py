"""On-device rescale-weight reduction (analysis/ondevice_rescale.py +
evalution_loop.ondevice_rescale): the recording pass reduces squeeze maps to
per-(module, view) means over the training indices ON DEVICE and writes a
KB-sized rescale_means.pkl instead of fetching/storing the multi-MB
per-sample payload.  The means must match the default history.pickle
pipeline's get_rescale_weights output; the heavy payload must actually be
absent from the on-device run's artifacts."""

import os
import pickle

import numpy as np
import pytest

from greedy_multimodal_learning_tpu import config as cfg
from greedy_multimodal_learning_tpu.data.synthetic import make_synthetic_modelnet

IMG = 32


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from train import train

    tmp = tmp_path_factory.mktemp("odr")
    root = make_synthetic_modelnet(
        str(tmp / "data"), n_train=12, n_test=8, num_views=2, image_size=IMG, nclasses=4
    )
    save = str(tmp / "run")
    cfg.clear_config()
    cfg.parse_config(
        f"""
        MMTM_MVCNN.num_views = 2
        MMTM_MVCNN.nclasses = 4
        get_mvdcndata.root_dir = '{root}'
        get_mvdcndata.num_views = 2
        get_mvdcndata.specific_views = [0, 1]
        train.batch_size = 4
        train.lr = 0.05
        train.wd = 0.0
        train.momentum = 0
        train.callbacks = ['CompletedStopping', 'Bias_Mitigation_Random']
        training_loop.n_epochs = 3
        training_loop.checkpoint_monitor = 'val_acc'
        """
    )
    os.makedirs(save, exist_ok=True)
    train(save)
    cfg.clear_config()
    return tmp, root, save


def _recording_bindings(root, save, ondevice=False, training_path=None):
    cfg.clear_config()
    cfg.parse_config_file("configs/recording.gin")
    extra = ""
    if ondevice:
        extra = (
            "evalution_loop.ondevice_rescale = True\n"
            f"evalution_loop.ondevice_rescale_training_path = '{training_path}'"
        )
    cfg.parse_config(
        f"""
        MMTM_MVCNN.nclasses = 4
        get_mvdcndata.root_dir = '{root}'
        get_mvdcndata.specific_views = [0, 1]
        eval_.batch_size = 4
        eval_.pretrained_weights_path = '{os.path.join(save, "model_best_val.pt")}'
        {extra}
        """
    )


def test_ondevice_means_match_pickle_pipeline(trained):
    from eval import eval_

    from greedy_multimodal_learning_tpu.analysis import get_rescale_weights
    from greedy_multimodal_learning_tpu.analysis.ondevice_rescale import (
        RESCALE_MEANS_FILENAME,
    )

    tmp, root, save = trained

    # default pipeline: per-sample payload into history.pickle
    _recording_bindings(root, save)
    eval_(save)
    default_dir = os.path.join(save, "eval_history_batch")
    assert os.path.exists(os.path.join(default_dir, "history.pickle"))

    # on-device pipeline: same checkpoint, separate output dir
    save_od = str(tmp / "run_od")
    os.makedirs(save_od, exist_ok=True)
    _recording_bindings(root, save, ondevice=True, training_path=save)
    eval_(save_od)
    cfg.clear_config()
    od_dir = os.path.join(save_od, "eval_history_batch")
    means_path = os.path.join(od_dir, RESCALE_MEANS_FILENAME)
    assert os.path.exists(means_path)

    # the heavy per-sample payload must be ABSENT from the on-device run
    with open(means_path, "rb") as f:
        blob = pickle.load(f)
    assert blob["count"] == 10  # 12 train samples, 20% val -> 10 train
    with open(os.path.join(od_dir, "history.pickle"), "rb") as f:
        H_od = pickle.load(f)
    assert "test_squeezedmaps_array_list" not in H_od, (
        "on-device mode must not record the per-sample squeeze payload"
    )
    assert len(H_od["test_indices"][0]) == 12  # indices still recorded

    # equivalence: fast path (means file) == full pickle pipeline
    ref = get_rescale_weights(default_dir, save)
    fast = get_rescale_weights(od_dir, save)
    assert ref[0] is None and fast[0] is None
    for position in range(1, 4):
        assert len(ref[position]) == len(fast[position]) == 2
        for view in range(2):
            assert fast[position][view].shape == ref[position][view].shape
            np.testing.assert_allclose(
                fast[position][view], ref[position][view], rtol=1e-5, atol=1e-6
            )

    # selection mismatch (validation=True) must NOT take the fast path;
    # it falls through to the pickle pipeline, which this run lacks
    with pytest.raises(Exception):
        get_rescale_weights(od_dir, save, validation=True)

    # a blob averaged over a DIFFERENT index set (stale, or from another
    # training run) must be ignored — the default dir has the per-sample
    # pickle, so the call falls through and still returns the true means
    stale = dict(blob)
    stale["selected"] = np.asarray([0], np.int64)
    with open(os.path.join(default_dir, RESCALE_MEANS_FILENAME), "wb") as f:
        pickle.dump(stale, f)
    try:
        via_fallback = get_rescale_weights(default_dir, save)
        for position in range(1, 4):
            for view in range(2):
                np.testing.assert_array_equal(
                    via_fallback[position][view], ref[position][view]
                )
    finally:
        os.remove(os.path.join(default_dir, RESCALE_MEANS_FILENAME))


def test_accumulator_scan_and_step_shapes():
    """Unit: the jitted accumulator folds (flat,) per-step and (K, flat)
    scan-group buffers identically to a numpy oracle, counting only member
    rows."""
    import jax.numpy as jnp

    from greedy_multimodal_learning_tpu.analysis.ondevice_rescale import (
        RescaleMeanAccumulator,
    )

    rng = np.random.default_rng(0)
    B, C1, C2 = 3, 4, 5
    spec = [
        ("squeezedmaps_array_list", 0, 0, (B, C1)),
        ("mmtmscales_list", 0, 0, (B, C1)),  # non-squeeze entry: skipped
        ("squeezedmaps_array_list", 0, 1, (B, C2)),
    ]
    selected = [0, 2, 5]
    acc = RescaleMeanAccumulator(selected, spec)

    def pack(maps1, scales, maps2):
        return np.concatenate([maps1.ravel(), scales.ravel(), maps2.ravel()]).astype(np.float32)

    # per-step buffer: batch rows carry dataset indices [0, 1, 2]
    m1a, sca, m2a = rng.normal(size=(B, C1)), rng.normal(size=(B, C1)), rng.normal(size=(B, C2))
    member_a = acc.member_mask([0, 1, 2], 3, B)
    np.testing.assert_array_equal(member_a, [1, 0, 1])
    acc.consume(jnp.asarray(pack(m1a, sca, m2a)), member_a[None])

    # scan-group buffer (K=2): indices [5, 7, pad] and [9, 0(dup? no -> 3), 4]
    m1b, scb, m2b = rng.normal(size=(2, B, C1)), rng.normal(size=(2, B, C1)), rng.normal(size=(2, B, C2))
    packed = np.stack([pack(m1b[k], scb[k], m2b[k]) for k in range(2)])
    member_b = np.stack([acc.member_mask([5, 7], 2, B), acc.member_mask([9, 3, 4], 3, B)])
    np.testing.assert_array_equal(member_b, [[1, 0, 0], [0, 0, 0]])
    acc.consume(jnp.asarray(packed), member_b)

    means, count = acc.means()
    assert count == 3
    oracle1 = (m1a[0] + m1a[2] + m1b[0, 0]) / 3.0
    oracle2 = (m2a[0] + m2a[2] + m2b[0, 0]) / 3.0
    np.testing.assert_allclose(means[0][0], oracle1, rtol=1e-5)
    np.testing.assert_allclose(means[0][1], oracle2, rtol=1e-5)


def test_accumulator_duplicate_selection_uses_multiplicity():
    """Multi-host training histories can contain borrowed top-up duplicates
    (parallel/multihost.py); the host pipeline's maps[selected].mean(0)
    counts those rows once per occurrence, so the accumulator must weight
    by multiplicity."""
    import jax.numpy as jnp

    from greedy_multimodal_learning_tpu.analysis.ondevice_rescale import (
        RescaleMeanAccumulator,
    )

    rng = np.random.default_rng(1)
    B, C = 3, 4
    spec = [("squeezedmaps_array_list", 0, 0, (B, C))]
    acc = RescaleMeanAccumulator([1, 1, 2], spec)  # index 1 selected twice
    maps = rng.normal(size=(B, C)).astype(np.float32)
    member = acc.member_mask([1, 2, 5], 3, B)
    np.testing.assert_array_equal(member, [2, 1, 0])
    acc.consume(jnp.asarray(maps.ravel()), member[None])
    means, count = acc.means()
    assert count == 3
    # host oracle: rows indexed with the duplicate -> mean over [m1, m1, m2]
    oracle = (2 * maps[0] + maps[1]) / 3.0
    np.testing.assert_allclose(means[0][0], oracle, rtol=1e-5)


def test_accumulator_through_scanned_eval_pass(tmp_path):
    """End-to-end through Trainer._eval_generator with enough batches to
    engage the scanned eval program (2 scan groups of K=10 + a per-step
    tail): the on-device means must equal a host-side average of the
    recorded per-sample maps over the selected indices."""
    import jax
    import jax.numpy as jnp

    from greedy_multimodal_learning_tpu.analysis.ondevice_rescale import (
        RescaleMeanAccumulator,
    )
    from greedy_multimodal_learning_tpu.data import BatchPipeline, MultiviewModelNet
    from greedy_multimodal_learning_tpu.engine import create_train_state, make_optimizer
    from greedy_multimodal_learning_tpu.engine.framework import Trainer
    from greedy_multimodal_learning_tpu.models import MMTMMVCNN

    n = 88  # batch 4 -> 22 steps >= 2 * eval_scan_size
    root = make_synthetic_modelnet(str(tmp_path / "d"), n_train=n, n_test=4,
                                   num_views=2, image_size=32, nclasses=4)
    ds = MultiviewModelNet(root, "train", specific_view=[0, 1])
    selected = list(range(0, n, 3))  # arbitrary subset

    def run(install_accumulator):
        pipe = BatchPipeline(ds, range(n), 4, shuffle=False, prefetch=0)
        model = MMTMMVCNN(nclasses=4, num_towers=2, dtype=jnp.float32,
                          saving_mmtm_squeeze_array=True)
        state = create_train_state(model, make_optimizer(lr=0.1),
                                   jax.random.PRNGKey(0),
                                   jnp.zeros((4, 2, 32, 32, 3), jnp.float32))
        trainer = Trainer(model=model, optimizer=make_optimizer(lr=0.1),
                          state=state, verbose=False)
        acc = None
        if install_accumulator:
            acc = RescaleMeanAccumulator(selected, trainer._eval_step.record_pack_spec)
            trainer.rescale_accumulator = acc
        info = trainer._eval_generator(pipe, "test")
        return info, acc

    info, _ = run(False)
    assert "test_squeezedmaps_array_list" in info
    # host oracle: concat per-batch maps (dataset order, shuffle=False),
    # average over the selected rows
    batches = info["test_squeezedmaps_array_list"]
    ordered = {  # (module, view) -> (n, C)
        (mi, vi): np.concatenate([b[mi][vi] for b in batches])
        for mi in range(3) for vi in range(2)
    }

    info_acc, acc = run(True)
    assert "test_squeezedmaps_array_list" not in info_acc  # payload dropped
    assert info_acc["test_acc"] == info["test_acc"]  # metrics unaffected
    means, count = acc.means()
    assert count == len(selected)
    for mi in range(3):
        for vi in range(2):
            np.testing.assert_allclose(
                means[mi][vi], ordered[(mi, vi)][selected].mean(0),
                rtol=1e-5, atol=1e-6,
            )
