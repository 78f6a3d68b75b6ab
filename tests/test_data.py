"""Data pipeline tests: exact val-split reproduction, static-shape padding,
device-side transforms."""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from greedy_multimodal_learning_tpu import config as cfg
from greedy_multimodal_learning_tpu.data import (
    BatchPipeline,
    MultiviewModelNet,
    get_mvdcndata,
    preprocess,
    reference_val_split,
)
from greedy_multimodal_learning_tpu.data.modelnet import IMAGENET_MEAN, IMAGENET_STD
from greedy_multimodal_learning_tpu.data.synthetic import make_synthetic_modelnet


def test_val_split_matches_reference_semantics():
    """Must reproduce random.Random(10).shuffle(range(n)) -> first 20% = val
    (reference: src/dataset.py:66-75): which samples are validation defines
    the whole analysis pipeline downstream."""
    n, valid_size = 100, 0.2
    train_idx, val_idx = reference_val_split(n, valid_size, 10)
    expected = list(range(n))
    random.Random(10).shuffle(expected)
    split = int(np.floor(valid_size * n))
    assert val_idx == expected[:split]
    assert train_idx == expected[split:]
    # determinism
    assert reference_val_split(n, valid_size, 10)[1] == val_idx


def test_val_split_zero_size():
    train_idx, val_idx = reference_val_split(10, 0.0)
    assert val_idx == []
    assert len(train_idx) == 10


def test_synthetic_dataset_roundtrip(tmp_path):
    root = make_synthetic_modelnet(str(tmp_path), n_train=6, n_test=3, num_views=4, image_size=16)
    ds = MultiviewModelNet(root, "train", specific_view=[0, 2])
    assert len(ds) == 6
    idx, imgs, cls = ds[1]
    assert idx == 1
    assert imgs.shape == (2, 16, 16, 3)
    assert imgs.dtype == np.uint8
    assert 0 <= cls < 4


def test_batch_pipeline_padding_and_mask(tmp_path):
    root = make_synthetic_modelnet(str(tmp_path), n_train=5, n_test=3, num_views=2, image_size=8)
    ds = MultiviewModelNet(root, "train", specific_view=[0, 1])
    pipe = BatchPipeline(ds, range(5), batch_size=4, shuffle=False, prefetch=0)
    batches = list(pipe)
    assert len(batches) == len(pipe) == 2
    b0, b1 = batches
    assert b0["images"].shape == (4, 2, 8, 8, 3)
    assert b0["size"] == 4 and b1["size"] == 1
    assert b1["images"].shape == (4, 2, 8, 8, 3)  # padded to static shape
    np.testing.assert_array_equal(b1["mask"], [1, 0, 0, 0])
    np.testing.assert_array_equal(b1["indices"][1:], [-1, -1, -1])
    # all real indices covered exactly once
    seen = np.concatenate([b0["indices"], b1["indices"][:1]])
    assert sorted(seen.tolist()) == list(range(5))


def test_batch_pipeline_shuffle_covers_all(tmp_path):
    root = make_synthetic_modelnet(str(tmp_path), n_train=8, n_test=3, num_views=2, image_size=8)
    ds = MultiviewModelNet(root, "train", specific_view=[0, 1])
    pipe = BatchPipeline(ds, range(8), batch_size=4, shuffle=True, seed=0)
    e1 = np.concatenate([b["indices"] for b in pipe])
    e2 = np.concatenate([b["indices"] for b in pipe])
    assert sorted(e1.tolist()) == list(range(8))
    assert not np.array_equal(e1, e2)  # reshuffled across epochs


def test_get_mvdcndata_gin_surface(tmp_path):
    root = make_synthetic_modelnet(str(tmp_path), n_train=10, n_test=4, num_views=4, image_size=8)
    cfg.parse_config(
        f"""
        get_mvdcndata.root_dir = '{root}'
        get_mvdcndata.valid_size = 0.2
        get_mvdcndata.batch_size = 4
        get_mvdcndata.specific_views = [0, 2]
        """
    )
    train, valid, test = get_mvdcndata()
    assert train.num_samples == 8
    assert valid.num_samples == 2
    assert test.num_samples == 4
    b = next(iter(train))
    assert b["images"].shape == (4, 2, 8, 8, 3)


def test_preprocess_matches_reference_transform():
    """Device preprocess == ToTensor + Normalize (reference: src/dataset.py:35-39)."""
    imgs = np.random.default_rng(0).integers(0, 255, (2, 2, 8, 8, 3), dtype=np.uint8)
    out = preprocess(jnp.asarray(imgs), train=False)
    expected = (imgs.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-6)


def test_preprocess_flip_is_horizontal_and_per_view():
    imgs = np.zeros((4, 2, 4, 6, 3), np.uint8)
    ramp = np.arange(6, dtype=np.uint8).reshape(1, 1, 6, 1) * 40
    imgs = imgs + ramp  # horizontal ramp
    out = np.asarray(preprocess(jnp.asarray(imgs), train=True, rng=jax.random.PRNGKey(3)))
    expected = (imgs.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    flipped = expected[:, :, :, ::-1, :]
    flips = []
    for b in range(4):
        for v in range(2):
            if np.allclose(out[b, v], expected[b, v], atol=1e-5):
                flips.append(0)
            elif np.allclose(out[b, v], flipped[b, v], atol=1e-5):
                flips.append(1)
            else:
                raise AssertionError("output is neither identity nor horizontal flip")
    assert 0 < sum(flips) < len(flips)  # some flipped, some not


def test_pipeline_producer_error_propagates(tmp_path):
    """A dataset error inside the prefetch producer must fail the epoch
    loudly, not silently end it early."""
    import pytest

    from greedy_multimodal_learning_tpu.data import BatchPipeline

    class Broken:
        def __getitem__(self, i):
            if i >= 4:
                raise OSError("corrupt sample")
            import numpy as np

            return i, np.zeros((2, 8, 8, 3), np.uint8), 0

    pipe = BatchPipeline(Broken(), range(8), batch_size=2, shuffle=False, prefetch=2)
    with pytest.raises(RuntimeError, match="producer"):
        list(pipe)


def test_pipeline_early_stop_releases_producer(tmp_path):
    """Consuming fewer batches than an epoch holds must not leave the
    producer thread blocked forever on a full queue."""
    import threading
    import time

    import numpy as np

    from greedy_multimodal_learning_tpu.data import BatchPipeline

    class DS:
        def __getitem__(self, i):
            return i, np.zeros((2, 8, 8, 3), np.uint8), 0

    before = threading.active_count()
    for _ in range(5):
        pipe = BatchPipeline(DS(), range(64), batch_size=2, shuffle=False, prefetch=1)
        it = iter(pipe)
        next(it)  # take one of 32 batches
        it.close()  # generator finalizer signals the producer
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer threads leaked"


def test_preprocess_clip_flip_shared_across_modalities():
    """Video clips (B, M, T, H, W, C): the train-time flip must be drawn
    per sample, not per modality — mismatched flips would feed the fusion
    spatially misaligned modality pairs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from greedy_multimodal_learning_tpu.data.transforms import preprocess

    rng = np.random.default_rng(0)
    clips = rng.integers(0, 255, (4, 3, 2, 8, 8, 3), dtype=np.uint8)
    out = np.asarray(preprocess(jnp.asarray(clips), train=True, rng=jax.random.PRNGKey(3)))
    ref = np.asarray(preprocess(jnp.asarray(clips), train=False))
    for b in range(4):
        flipped = [
            not np.allclose(out[b, m], ref[b, m], atol=1e-5) for m in range(3)
        ]
        assert len(set(flipped)) == 1, f"sample {b}: modalities flipped inconsistently {flipped}"


def test_preprocess_flip_rate_is_half():
    """The train flip is per-(sample, view) Bernoulli(0.5) — the reference
    applies torchvision RandomHorizontalFlip(p=0.5) independently per view
    (reference: src/dataset.py:41-47, 123-127).  Statistical pin: over
    4096 draws the empirical rate must sit inside a 5-sigma binomial band
    around 0.5 (±0.039), and the flips must vary across BOTH axes."""
    n, v = 2048, 2
    imgs = np.broadcast_to(
        (np.arange(6, dtype=np.uint8).reshape(1, 1, 1, 6, 1) * 40), (n, v, 4, 6, 3)
    )
    out = np.asarray(preprocess(jnp.asarray(imgs), train=True, rng=jax.random.PRNGKey(7)))
    expected = (imgs.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    # column 0 of the ramp: normalized 0 if unflipped, normalized 200 if flipped
    flips = ~np.isclose(out[:, :, 0, 0, 0], expected[:, :, 0, 0, 0], atol=1e-5)
    rate = flips.mean()
    sigma5 = 5 * 0.5 / (n * v) ** 0.5
    assert abs(rate - 0.5) < sigma5, rate
    # independence across views: both views' per-sample draws must differ somewhere
    assert (flips[:, 0] != flips[:, 1]).any()
