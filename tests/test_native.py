"""Native data-plane collator: builds with the system toolchain and matches
the numpy path exactly."""

import numpy as np
import pytest

from greedy_multimodal_learning_tpu.utils.native import collate_u8, lib


def test_native_library_builds():
    assert lib() is not None, "g++ toolchain present in this image; build must succeed"


def test_collate_matches_numpy():
    rng = np.random.default_rng(0)
    samples = [rng.integers(0, 255, (2, 7, 5, 3), dtype=np.uint8) for _ in range(5)]
    out = collate_u8(samples, 8)
    assert out is not None
    assert out.shape == (8, 2, 7, 5, 3)
    ref = np.concatenate([np.stack(samples), np.zeros((3, 2, 7, 5, 3), np.uint8)])
    np.testing.assert_array_equal(out, ref)


def test_collate_full_batch():
    rng = np.random.default_rng(1)
    samples = [rng.integers(0, 255, (4, 4, 3), dtype=np.uint8) for _ in range(4)]
    out = collate_u8(samples, 4)
    np.testing.assert_array_equal(out, np.stack(samples))


def test_collate_rejects_noncontiguous():
    a = np.zeros((4, 4, 3), np.uint8)[::2]
    assert collate_u8([a], 2) is None


def test_pipeline_uses_native_and_matches(tmp_path):
    from greedy_multimodal_learning_tpu.data import BatchPipeline, MultiviewModelNet
    from greedy_multimodal_learning_tpu.data.synthetic import make_synthetic_modelnet

    root = make_synthetic_modelnet(str(tmp_path), n_train=5, n_test=2, num_views=2, image_size=8)
    ds = MultiviewModelNet(root, "train", specific_view=[0, 1])
    pipe = BatchPipeline(ds, range(5), batch_size=4, shuffle=False, prefetch=0)
    b0, b1 = list(pipe)
    assert b0["images"].shape == (4, 2, 8, 8, 3)
    np.testing.assert_array_equal(b0["images"][0], ds[0][1])
    np.testing.assert_array_equal(b1["images"][1:], 0)  # padded rows zeroed


def test_gather_views_matches_numpy():
    from greedy_multimodal_learning_tpu.utils.native import gather_views_u8, lib

    rng = np.random.default_rng(0)
    stack = rng.integers(0, 255, (12, 6, 5, 3), dtype=np.uint8)
    for views in ([0, 6], [11, 0, 3], [2]):
        out = gather_views_u8(stack, views)
        if lib() is None:
            assert out is None
            return
        np.testing.assert_array_equal(out, stack[views])


def test_gather_views_rejects_bad_indices():
    from greedy_multimodal_learning_tpu.utils.native import gather_views_u8

    stack = np.zeros((4, 2, 2, 3), np.uint8)
    assert gather_views_u8(stack, [0, 4]) is None  # out of range
    assert gather_views_u8(stack, []) is None
    assert gather_views_u8(stack.astype(np.float32), [0]) is None
