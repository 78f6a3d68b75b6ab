"""Device-resident dataset cache: cached batches must equal streamed
batches byte-for-byte (images, labels, mask, indices, size, order), the
(seed, epoch) order contract must survive resume, and the budget check must
fall back to streaming.

Rationale: the cache removes the per-step image H2D (PERF.md: the 25x
gap between compute and e2e throughput at B=128 was all transfer), so its
ONLY acceptable observable difference from streaming is speed.
"""

import numpy as np
import pytest

import jax

from greedy_multimodal_learning_tpu import config as cfg
from greedy_multimodal_learning_tpu.data import (
    BatchPipeline,
    DeviceCachePipeline,
    MultiviewModelNet,
    get_mvdcndata,
    wrap_device_cache,
)
from greedy_multimodal_learning_tpu.data.synthetic import make_synthetic_modelnet


@pytest.fixture(scope="module")
def modelnet_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cache_data")
    return make_synthetic_modelnet(
        str(root), n_train=14, n_test=6, num_views=2, image_size=16, nclasses=3
    )


def _pipelines(root, *, batch_size=4, shuffle=True, indices=None):
    ds = MultiviewModelNet(root, "train", specific_view=[0, 1])
    if indices is None:
        indices = list(range(len(ds)))
    streamed = BatchPipeline(ds, indices, batch_size, shuffle=shuffle, seed=777)
    cached = DeviceCachePipeline(ds, indices, batch_size, shuffle=shuffle, seed=777)
    return streamed, cached


def _materialize(batch):
    return {k: np.asarray(v) if k != "size" else v for k, v in batch.items()}


def test_cached_equals_streamed_across_epochs(modelnet_root):
    """Two epochs incl. a padded partial batch (14 % 4 != 0): every field of
    every batch identical, in identical order."""
    streamed, cached = _pipelines(modelnet_root)
    for epoch in range(2):
        sb = [_materialize(b) for b in streamed]
        cb = [_materialize(b) for b in cached]
        assert len(sb) == len(cb) == len(streamed) == len(cached)
        for s, c in zip(sb, cb):
            assert s["size"] == c["size"]
            np.testing.assert_array_equal(s["indices"], c["indices"])
            np.testing.assert_array_equal(s["labels"], c["labels"])
            np.testing.assert_array_equal(s["mask"], c["mask"])
            np.testing.assert_array_equal(s["images"], c["images"])


def test_cached_batches_are_device_resident(modelnet_root):
    _, cached = _pipelines(modelnet_root)
    batch = next(iter(cached))
    assert isinstance(batch["images"], jax.Array)
    assert isinstance(batch["labels"], jax.Array)
    # host-side fields stay host-side (consumed by history recording only)
    assert isinstance(batch["indices"], np.ndarray)
    assert batch["images"].dtype == np.uint8


def test_set_epoch_resume_order_matches_streaming(modelnet_root):
    """Resume contract: order is a pure function of (seed, epoch) — a cached
    pipeline resumed at epoch k replays exactly the streamed epoch-k order."""
    streamed, cached = _pipelines(modelnet_root)
    streamed.set_epoch(5)
    cached.set_epoch(5)
    s_idx = np.concatenate([b["indices"][: b["size"]] for b in streamed])
    c_idx = np.concatenate([b["indices"][: b["size"]] for b in cached])
    np.testing.assert_array_equal(s_idx, c_idx)


def test_budget_fallback_streams_identically(modelnet_root, caplog):
    import logging

    streamed, cached = _pipelines(modelnet_root, shuffle=False)
    cached.fallback_budget_bytes = 1  # force the budget check to fail
    with caplog.at_level(logging.WARNING):
        cb = [_materialize(b) for b in cached]
    assert cached._corpus is None and cached._streaming
    sb = [_materialize(b) for b in streamed]
    for s, c in zip(sb, cb):
        np.testing.assert_array_equal(s["images"], c["images"])
        np.testing.assert_array_equal(s["labels"], c["labels"])
    # once latched, later epochs stay streaming (no repeated upload attempts)
    assert not cached._ensure_corpus()


def test_budget_respects_device_memory_stats(modelnet_root, monkeypatch):
    """When the backend reports memory stats (TPU does; CPU may not), the
    corpus must fit within budget_frac of FREE memory or fall back."""
    _, cached = _pipelines(modelnet_root)

    class FakeDev:
        def memory_stats(self):
            return {"bytes_limit": 100, "bytes_in_use": 90}

    assert not cached._budget_ok(FakeDev())

    class BigDev:
        def memory_stats(self):
            return {"bytes_limit": 1 << 40, "bytes_in_use": 0}

    assert cached._budget_ok(BigDev())


def test_subset_indices_and_pad_row(modelnet_root):
    """Non-contiguous dataset indices (a val split) map through the row LUT;
    the padded tail row is all-zero with label 0 / index -1 / mask 0,
    matching _collate's zero-padding exactly."""
    indices = [11, 3, 7, 0, 9]  # 5 samples, batch 4 -> one padded row
    streamed, cached = _pipelines(modelnet_root, shuffle=False, indices=indices)
    sb = [_materialize(b) for b in streamed]
    cb = [_materialize(b) for b in cached]
    assert [b["size"] for b in cb] == [4, 1]
    for s, c in zip(sb, cb):
        np.testing.assert_array_equal(s["images"], c["images"])
        np.testing.assert_array_equal(s["indices"], c["indices"])
    tail = cb[-1]
    assert (tail["images"][1:] == 0).all()
    assert (tail["labels"][1:] == 0).all()
    assert (tail["indices"][1:] == -1).all()
    assert (tail["mask"][1:] == 0).all()


def test_get_mvdcndata_device_cache_binding(modelnet_root):
    """The loader factory's device_cache kwarg (additive gin extension)
    selects the cached pipeline; False keeps streaming."""
    cfg.clear_config()
    train, valid, test = get_mvdcndata(
        root_dir=modelnet_root, specific_views=[0, 1], batch_size=4, device_cache="auto"
    )
    assert isinstance(train, DeviceCachePipeline)
    assert isinstance(valid, DeviceCachePipeline)
    assert isinstance(test, DeviceCachePipeline)
    train2, _, _ = get_mvdcndata(
        root_dir=modelnet_root, specific_views=[0, 1], batch_size=4, device_cache=False
    )
    assert not isinstance(train2, DeviceCachePipeline)


def test_wrap_upgrades_under_multiprocess(monkeypatch, modelnet_root):
    """Multi-host runs shard the cache per process (each pipeline holds only
    its process-local index slice) — auto must wrap, not refuse."""
    streamed, _ = _pipelines(modelnet_root)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    assert isinstance(wrap_device_cache(streamed, "auto"), DeviceCachePipeline)
    monkeypatch.undo()
    assert isinstance(wrap_device_cache(streamed, "auto"), DeviceCachePipeline)


def test_cached_training_run_matches_streamed(modelnet_root):
    """End-to-end: a short jitted training run over the cached pipeline
    produces bit-identical epoch metrics to the streamed pipeline (the
    gather feeds the very same donated train step)."""
    import jax.numpy as jnp

    from greedy_multimodal_learning_tpu.engine import create_train_state, make_optimizer
    from greedy_multimodal_learning_tpu.engine.framework import Trainer
    from greedy_multimodal_learning_tpu.models import MMTMMVCNN

    results = {}
    for name in ("streamed", "cached"):
        streamed, cached = _pipelines(modelnet_root, batch_size=4)
        gen = cached if name == "cached" else streamed
        model = MMTMMVCNN(nclasses=3, num_towers=2, dtype=jnp.float32)
        optimizer = make_optimizer(lr=0.05)
        sample = jnp.zeros((4, 2, 16, 16, 3), jnp.float32)
        state = create_train_state(model, optimizer, jax.random.PRNGKey(0), sample)
        trainer = Trainer(model, optimizer, state, nummodalities=2, verbose=False)
        logs = []

        from greedy_multimodal_learning_tpu.engine.callbacks import LambdaCallback

        cb = LambdaCallback(on_epoch_end=lambda e, l: logs.append(dict(l)))
        trainer.train_loop(gen, epochs=2, steps_per_epoch=len(gen), callbacks=[cb])
        results[name] = logs

    for ls, lc in zip(results["streamed"], results["cached"]):
        assert ls["loss"] == lc["loss"]
        assert ls["acc"] == lc["acc"]
        np.testing.assert_array_equal(ls["train_indices"], lc["train_indices"])


def test_host_cache_released_after_upload(modelnet_root):
    """Corpus assembly must not leave a second full copy of the split in the
    dataset's host cache (the cached path never reads host samples again)."""
    streamed, cached = _pipelines(modelnet_root)
    ds = cached.dataset
    assert ds._cache == {}  # nothing touched yet
    pre = ds[0]  # pre-warmed entry must survive the release
    assert list(ds._cache) == [0]
    assert cached._ensure_corpus()
    assert list(ds._cache) == [0], "upload-added entries must be released"
    del pre


def test_host_cache_released_after_mesh_upload(modelnet_root):
    """The mesh-replicated layout must release upload-added host-cache
    entries exactly like the pinned layout (no second host copy)."""
    from greedy_multimodal_learning_tpu.data.pipeline import adopt_mesh_for_cache
    from greedy_multimodal_learning_tpu.parallel import make_mesh

    _, cached = _pipelines(modelnet_root)
    adopt_mesh_for_cache([cached], make_mesh(jax.devices()))
    ds = cached.dataset
    assert ds._cache == {}
    assert cached._ensure_corpus()
    assert cached.mesh is not None and ds._cache == {}


def test_fallback_budget_refusal_logs(modelnet_root, caplog, monkeypatch):
    """The no-memory-stats budget branch must warn like the stats branch."""
    import logging

    streamed, cached = _pipelines(modelnet_root)
    monkeypatch.setattr(type(cached), "fallback_budget_bytes", 1, raising=False)

    class NoStats:
        def memory_stats(self):
            raise RuntimeError("unsupported")

    monkeypatch.setattr(jax, "local_devices", lambda *a, **k: [NoStats()])
    with caplog.at_level(logging.WARNING):
        ok = cached._ensure_corpus()
    assert not ok and cached._streaming
    assert any("fallback budget" in r.message for r in caplog.records)


def test_cache_adopts_mesh_and_emits_sharded_batches(modelnet_root):
    """adopt_mesh_for_cache upgrades a not-yet-uploaded cache: the corpus
    replicates over the mesh and every batch comes out ALREADY sharded
    P('data') — byte-identical to the streamed batches, no device-0 pin."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from greedy_multimodal_learning_tpu.data.pipeline import adopt_mesh_for_cache
    from greedy_multimodal_learning_tpu.parallel import make_mesh

    mesh = make_mesh(jax.devices())
    assert mesh.size == 8  # conftest forces the 8-virtual-device harness
    streamed, cached = _pipelines(modelnet_root, batch_size=8, shuffle=True)
    adopt_mesh_for_cache([cached, streamed], mesh)  # non-cache entries ignored
    assert cached.mesh is mesh

    sb = [_materialize(b) for b in streamed]
    cb = list(cached)
    assert cached._corpus is not None
    # corpus replicated, batches sharded over the data axis
    assert cached._corpus[0].sharding.is_equivalent_to(
        NamedSharding(mesh, P()), cached._corpus[0].ndim
    )
    for c in cb:
        assert c["images"].sharding.is_equivalent_to(
            NamedSharding(mesh, P("data")), c["images"].ndim
        )
        assert len(c["images"].sharding.device_set) == 8
    for s, c in zip(sb, [_materialize(b) for b in cb]):
        assert s["size"] == c["size"]
        np.testing.assert_array_equal(s["images"], c["images"])
        np.testing.assert_array_equal(s["labels"], c["labels"])
        np.testing.assert_array_equal(s["mask"], c["mask"])


def test_adopt_mesh_skips_uploaded_cache(modelnet_root, caplog):
    """A cache whose corpus already uploaded keeps its pinned layout (and
    says so) — adoption only applies before first iteration."""
    import logging

    from greedy_multimodal_learning_tpu.data.pipeline import adopt_mesh_for_cache
    from greedy_multimodal_learning_tpu.parallel import make_mesh

    _, cached = _pipelines(modelnet_root)
    assert cached._ensure_corpus()
    with caplog.at_level(logging.WARNING):
        adopt_mesh_for_cache([cached], make_mesh(jax.devices()))
    assert cached.mesh is None
    assert any("already uploaded" in r.message for r in caplog.records)
    # no mesh / 1-device mesh: silent no-op
    caplog.clear()
    with caplog.at_level(logging.WARNING):
        adopt_mesh_for_cache([cached], None)
    assert not caplog.records


_MH_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["GML_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(os.environ["GML_COORD"], 2, int(os.environ["GML_PID"]))
import numpy as np
from jax.sharding import Mesh
from greedy_multimodal_learning_tpu.data import (
    BatchPipeline, DeviceCachePipeline, MultiviewModelNet, wrap_device_cache)
from greedy_multimodal_learning_tpu.data.synthetic import make_synthetic_modelnet
from greedy_multimodal_learning_tpu.parallel.multihost import (
    global_batch_from_local, process_local_indices)

pid = jax.process_index()
mesh = Mesh(np.array(jax.devices()).reshape(-1, 1), ("data", "model"))
# same seed on both processes -> identical dataset bytes
root = make_synthetic_modelnet(os.path.join(os.environ["GML_TMP"], f"d{pid}"),
                               n_train=9, n_test=4, num_views=2, image_size=16, nclasses=3)
ds = MultiviewModelNet(root, "train", specific_view=[0, 1])
# 9 rows over 2 processes: pid 1 gets a borrowed top-up index (a row owned
# by pid 0's slice) -- the sharded cache must cover borrowed rows too
local_idx = process_local_indices(range(9))
assert len(local_idx) == 5, local_idx
streamed = BatchPipeline(ds, local_idx, 4, shuffle=True, seed=31, prefetch=0)
cached = wrap_device_cache(
    BatchPipeline(ds, local_idx, 4, shuffle=True, seed=31, prefetch=0), "auto")
assert isinstance(cached, DeviceCachePipeline), type(cached)

def shards(global_arr):
    return [np.asarray(s.data) for s in sorted(
        global_arr.addressable_shards, key=lambda s: s.index)]

for epoch in range(2):
    sbs, cbs = list(streamed), list(cached)
    assert cached._corpus is not None, "cache must not have fallen back"
    assert len(sbs) == len(cbs) == 2, (len(sbs), len(cbs))
    for sb, cb in zip(sbs, cbs):
        assert sb["size"] == cb["size"]
        np.testing.assert_array_equal(sb["indices"], cb["indices"])
        gs = global_batch_from_local(sb, mesh)
        gc = global_batch_from_local(cb, mesh)
        for key in ("images", "labels", "mask"):
            assert gs[key].shape == gc[key].shape
            for a, b in zip(shards(gs[key]), shards(gc[key])):
                np.testing.assert_array_equal(a, b)
print(f"proc {pid} MH_CACHE_OK", flush=True)
"""


def test_two_process_sharded_cache_equals_streamed(tmp_path):
    """Multi-host sharded device cache: each process caches its local index
    slice on its first local device; the assembled GLOBAL batches must be
    byte-for-byte identical to the streamed multi-host path, every shard,
    both epochs, incl. a borrowed top-up row and a padded partial batch."""
    import socket
    import subprocess
    import sys as _sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    worker = tmp_path / "mh_cache_worker.py"
    worker.write_text(_MH_WORKER)
    repo = __import__("os").path.abspath(__import__("os").path.join(__import__("os").path.dirname(__file__), ".."))
    procs = []
    for pid in range(2):
        env = {k: v for k, v in __import__("os").environ.items() if k != "PALLAS_AXON_POOL_IPS"}
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            GML_COORD=f"127.0.0.1:{port}",
            GML_PID=str(pid),
            GML_REPO=repo,
            GML_TMP=str(tmp_path),
        )
        procs.append(subprocess.Popen(
            [_sys.executable, str(worker)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.skip("2-process jax.distributed timed out in this runtime")
        outs.append((p.returncode, out))
    for rc, out in outs:
        if rc != 0 and ("UNIMPLEMENTED" in out or "not supported" in out.lower()):
            pytest.skip(f"multi-process CPU collectives unsupported here: {out[-400:]}")
        assert rc == 0, out
        assert "MH_CACHE_OK" in out
