#!/usr/bin/env python3
"""Headline benchmark: ModelNet40 2-view MMTM-MVCNN training throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/sec", "vs_baseline": N}

* value — samples/sec/chip for the full jitted guided train step (uint8
  host batch -> device preprocess -> 2xResNet-18 + MMTM forward/backward ->
  BDR stats -> SGD -> controller update) at 224x224, bf16 compute / f32
  state, on the default JAX device (one TPU chip here).
* vs_baseline — ratio against the PyTorch-CPU reference workload
  (2xresnet18 + MMTM forward/backward/SGD, batch 8, f32 — the reference's
  operative configuration; BASELINE.md).  The torch measurement is cached
  in bench_baseline.json since the CPU is fixed.
"""

import json
import logging
import os
import sys
import time

import numpy as np

# stdout must carry exactly one JSON line: route all logging to stderr
# (the package root logger defaults to stdout).
for _h in list(logging.getLogger().handlers):
    logging.getLogger().removeHandler(_h)
_h = logging.StreamHandler(sys.stderr)
_h.setLevel(logging.INFO)
logging.getLogger().addHandler(_h)

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, "bench_baseline.json")

IMAGE = 224
NCLASSES = 40
TPU_BATCH = 128
TORCH_BATCH = 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _build(batch_size):
    import jax
    import jax.numpy as jnp

    from greedy_multimodal_learning_tpu.engine import create_train_state, make_optimizer
    from greedy_multimodal_learning_tpu.engine.bdr import GroupReducer
    from greedy_multimodal_learning_tpu.engine.steps import build_train_step, make_controller_update
    from greedy_multimodal_learning_tpu.models import MMTMMVCNN

    model = MMTMMVCNN(nclasses=NCLASSES, num_towers=2, dtype=jnp.bfloat16)
    optimizer = make_optimizer(lr=0.1)
    sample = jnp.zeros((batch_size, 2, IMAGE, IMAGE, 3), jnp.float32)
    state = create_train_state(model, optimizer, jax.random.PRNGKey(0), sample)
    gm = GroupReducer(state.params, ["net_view_0", "net_view_1"], ["visual", "skeleton"])
    ctrl = make_controller_update("guided", 2, epsilon=0.01, curation_windowsize=5)
    step = build_train_step(model, optimizer, gm, ctrl)
    return state, step


def _host_batch(seed, batch_size):
    r = np.random.default_rng(seed)
    return {
        "images": r.integers(0, 255, (batch_size, 2, IMAGE, IMAGE, 3), dtype=np.uint8),
        "labels": r.integers(0, NCLASSES, (batch_size,)).astype(np.int32),
        "mask": np.ones((batch_size,), np.float32),
    }


def measure_tpu_e2e(batch_size, steps=16, warmup=4):
    """End-to-end throughput: fresh HOST batches each step, H2D staged
    through the production prefetch path (data/pipeline.py device_prefetch),
    overlap and transfer cost included (reference hot loop has its H2D
    in-band, src/framework.py:165-169)."""
    import itertools

    import jax
    import jax.numpy as jnp

    from greedy_multimodal_learning_tpu.data.pipeline import device_prefetch

    state, step = _build(batch_size)
    unlock = jnp.asarray(True)
    host_batches = [_host_batch(i, batch_size) for i in range(4)]

    def feed(n):
        return itertools.islice(itertools.cycle(host_batches), n)

    for batch in device_prefetch(feed(warmup), depth=2):
        state, out = step(state, batch, unlock)
    float(out["loss"])

    t0 = time.perf_counter()
    for batch in device_prefetch(feed(steps), depth=2):
        state, out = step(state, batch, unlock)
    float(out["loss"])
    dt = time.perf_counter() - t0
    sps = batch_size * steps / dt
    mb = host_batches[0]["images"].nbytes / 1e6
    log(f"e2e B={batch_size}: {steps} steps in {dt:.3f}s -> {sps:.1f} samples/sec "
        f"({mb:.1f} MB/batch H2D in-band)")
    return sps


def measure_tpu_e2e_cached(batch_size, steps=16, warmup=4):
    """End-to-end throughput on the PRODUCTION DEFAULT data path: the
    split's uint8 corpus resident in HBM, batches assembled on device by
    the DeviceCachePipeline's jitted index gather (per-step H2D = B int32
    rows + B float32 mask, ~1 KB).  The one-time corpus upload and compile
    are excluded — they amortize over a training run's epochs."""
    import jax.numpy as jnp

    from greedy_multimodal_learning_tpu.data.pipeline import DeviceCachePipeline

    state, step = _build(batch_size)
    n = batch_size * 4
    r = np.random.default_rng(0)
    imgs = r.integers(0, 255, (n, 2, IMAGE, IMAGE, 3), dtype=np.uint8)
    labels = r.integers(0, NCLASSES, (n,)).astype(np.int32)

    class _MemDS:
        def __len__(self):
            return n

        def __getitem__(self, i):
            return (i, imgs[i], int(labels[i]))

    pipe = DeviceCachePipeline(_MemDS(), range(n), batch_size, shuffle=True, seed=7)
    unlock = jnp.asarray(True)
    t_up = time.perf_counter()
    assert pipe._ensure_corpus(), "corpus upload failed"
    log(f"corpus upload: {imgs.nbytes / 1e6:.1f} MB in {time.perf_counter() - t_up:.1f}s (one-time)")

    def run(k):
        nonlocal state
        done = 0
        out = None
        while done < k:
            for batch in pipe:
                batch.pop("size")
                batch.pop("indices")
                state, out = step(state, batch, unlock)
                done += 1
                if done >= k:
                    break
        return out

    out = run(warmup)
    float(out["loss"])
    t0 = time.perf_counter()
    out = run(steps)
    float(out["loss"])
    dt = time.perf_counter() - t0
    sps = batch_size * steps / dt
    log(f"e2e-cached B={batch_size}: {steps} steps in {dt:.3f}s -> {sps:.1f} samples/sec "
        f"(on-device gather, ~1 KB H2D/step)")
    return sps


def measure_tpu(steps=20, warmup=5):
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    state, step = _build(TPU_BATCH)

    # Device-resident, double-buffered batches: the compute-only headline
    # (the e2e-with-input number is measured separately by measure_tpu_e2e;
    # in this dev environment the TPU sits behind a slow tunnel, so the
    # in-band H2D number also quantifies that link).
    batches = [jax.device_put(_host_batch(s, TPU_BATCH)) for s in (0, 1)]
    unlock = jnp.asarray(True)

    # NOTE: block_until_ready is unreliable on this experimental remote
    # backend (returns before execution finishes); a host value fetch is the
    # only trustworthy synchronization point.
    t0 = time.perf_counter()
    for i in range(warmup):
        state, out = step(state, batches[i % 2], unlock)
    float(out["loss"])
    log(f"compile+warmup: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    for i in range(steps):
        state, out = step(state, batches[i % 2], unlock)
    final_loss = float(out["loss"])  # forces completion of the whole chain
    dt = time.perf_counter() - t0
    sps = TPU_BATCH * steps / dt
    log(f"tpu: {steps} steps in {dt:.3f}s -> {sps:.1f} samples/sec (loss={final_loss:.3f})")
    return sps


def measure_torch_cpu(steps=2):
    """Reference-equivalent workload in torch on CPU (the reference's own
    hardware-free configuration): two resnet18 towers fused by three MMTM
    modules, blend loss, SGD step, batch 8 f32."""
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cached = json.load(f)
        log(f"torch-cpu baseline (cached): {cached['samples_per_sec']:.2f} samples/sec")
        return cached["samples_per_sec"]

    import torch
    import torch.nn as nn

    torch.set_num_threads(os.cpu_count() or 1)

    class BasicBlock(nn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.down = (
                nn.Sequential(nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout))
                if (stride != 1 or cin != cout)
                else None
            )

        def forward(self, x):
            idt = x if self.down is None else self.down(x)
            out = torch.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return torch.relu(out + idt)

    class Trunk(nn.Module):
        def __init__(self):
            super().__init__()
            self.stem = nn.Sequential(
                nn.Conv2d(3, 64, 7, 2, 3, bias=False), nn.BatchNorm2d(64), nn.ReLU(), nn.MaxPool2d(3, 2, 1)
            )
            cin = 64
            self.layers = nn.ModuleList()
            for li, w in enumerate([64, 128, 256, 512]):
                s = 1 if li == 0 else 2
                self.layers.append(nn.Sequential(BasicBlock(cin, w, s), BasicBlock(w, w, 1)))
                cin = w
            self.fc = nn.Linear(512, NCLASSES)

    class MMTMTorch(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.fc_squeeze = nn.Linear(2 * dim, dim)
            self.fc_a = nn.Linear(dim, dim)
            self.fc_b = nn.Linear(dim, dim)

        def forward(self, a, b):
            sa = a.mean((2, 3))
            sb = b.mean((2, 3))
            e = torch.relu(self.fc_squeeze(torch.cat([sa, sb], 1)))
            ga = torch.sigmoid(self.fc_a(e))[:, :, None, None]
            gb = torch.sigmoid(self.fc_b(e))[:, :, None, None]
            return a * ga, b * gb

    class TwoTower(nn.Module):
        def __init__(self):
            super().__init__()
            self.t0 = Trunk()
            self.t1 = Trunk()
            self.mmtms = nn.ModuleList([MMTMTorch(d) for d in (128, 256, 512)])

        def forward(self, x):
            a = self.t0.stem(x[:, 0])
            b = self.t1.stem(x[:, 1])
            a = self.t0.layers[0](a)
            b = self.t1.layers[0](b)
            for i in (1, 2, 3):
                a = self.t0.layers[i](a)
                b = self.t1.layers[i](b)
                a, b = self.mmtms[i - 1](a, b)
            la = self.t0.fc(a.mean((2, 3)))
            lb = self.t1.fc(b.mean((2, 3)))
            return la, lb

    model = TwoTower()
    opt = torch.optim.SGD(model.parameters(), lr=0.1)
    lossf = nn.CrossEntropyLoss()
    x = torch.randn(TORCH_BATCH, 2, 3, IMAGE, IMAGE)
    y = torch.randint(0, NCLASSES, (TORCH_BATCH,))

    # warmup
    la, lb = model(x)
    (lossf(la, y) + lossf(lb, y)).backward()
    opt.step()
    opt.zero_grad()

    t0 = time.perf_counter()
    for _ in range(steps):
        la, lb = model(x)
        loss = lossf(la, y) + lossf(lb, y)
        loss.backward()
        opt.step()
        opt.zero_grad()
    dt = time.perf_counter() - t0
    sps = TORCH_BATCH * steps / dt
    log(f"torch-cpu: {steps} steps in {dt:.2f}s -> {sps:.2f} samples/sec")
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"samples_per_sec": sps, "batch": TORCH_BATCH, "image": IMAGE, "threads": os.cpu_count()}, f)
    return sps


def main():
    tpu_sps = measure_tpu()
    try:
        cached_sps = measure_tpu_e2e_cached(TPU_BATCH)
    except Exception as e:
        log(f"cached e2e measurement failed: {e}")
        cached_sps = None
    try:
        # the reference's operative batch (configs/training.gin:6) on the
        # production-default cached path: the honest same-batch headline
        b8_cached_sps = measure_tpu_e2e_cached(TORCH_BATCH, steps=64, warmup=8)
    except Exception as e:
        log(f"B=8 cached e2e measurement failed: {e}")
        b8_cached_sps = None
    try:
        e2e_sps = measure_tpu_e2e(TPU_BATCH)
        b8_sps = measure_tpu_e2e(TORCH_BATCH)
    except Exception as e:  # keep the headline even if the e2e probe fails
        log(f"e2e measurement failed: {e}")
        e2e_sps = b8_sps = None
    try:
        base_sps = measure_torch_cpu()
    except Exception as e:  # torch unavailable -> report raw throughput
        log(f"baseline measurement failed: {e}")
        base_sps = None
    result = {
        "metric": "modelnet40_2view_train_samples_per_sec_per_chip",
        "value": round(tpu_sps, 2),
        "unit": "samples/sec",
        "vs_baseline": round(tpu_sps / base_sps, 2) if base_sps else None,
        # production default data path: HBM-resident corpus, on-device
        # batch gather (DeviceCachePipeline) — steady-state e2e
        "e2e_cached_samples_per_sec": round(cached_sps, 2) if cached_sps else None,
        # cached path at the reference's operative batch size (B=8): the
        # ≥20x north-star clause measured on the configuration as shipped
        "b8_e2e_cached_samples_per_sec": round(b8_cached_sps, 2) if b8_cached_sps else None,
        "vs_baseline_same_batch_b8_cached": (
            round(b8_cached_sps / base_sps, 2) if (b8_cached_sps and base_sps) else None
        ),
        # streaming e2e (host pipeline + in-band H2D over the dev tunnel)
        # and the same-batch (B=8) comparison against torch-CPU B=8
        "e2e_samples_per_sec": round(e2e_sps, 2) if e2e_sps else None,
        "b8_e2e_samples_per_sec": round(b8_sps, 2) if b8_sps else None,
        "vs_baseline_same_batch_b8": round(b8_sps / base_sps, 2) if (b8_sps and base_sps) else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
