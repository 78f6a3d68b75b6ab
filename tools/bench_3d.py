#!/usr/bin/env python3
"""Perf characterization of the 3-modality 3D-CNN family (BASELINE config 4).

PERF.md's measurement program (bench, roofline, MFU) covered only the
2-view 2D model; this tool gives the 3D family the same story on one chip:

  * measured guided train-step time / samples/sec/chip at the committed
    suite scale (tools/run_northstar3d.py: 3 towers, width 0.5, 8-frame
    32^2 clips, 10 classes) for the operative f32 batch 8 and the
    bf16 compute path at larger batches,
  * analytic Conv3D speed-of-light decomposition (MXU-efficiency model as
    tools/sol_table.py: bf16 contraction K x Cout padded to 128x128 MXU
    tiles; HBM activation traffic) -> per-stage bound + total SoL,
  * MFU = analytic model FLOPs / (measured time * peak),
  * device-cache residency: the suite's clip corpus vs HBM, plus the
    real-NVGesture-scale estimate.

Run (TPU): python tools/bench_3d.py [--batches 8 64 128] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

PEAK = 197e12  # v5e bf16 FLOP/s
PEAK_F32 = 49e12  # v5e f32 FLOP/s (no MXU bf16 packing)
HBM = 819e9  # v5e HBM bytes/s

# Committed suite scale (tools/run_northstar3d.py DATA_ARGS + WIDTH)
FRAMES, SIZE, NCLASSES, WIDTH, TOWERS = 8, 32, 10, 0.5, 3


def ceil128(x):
    return ((int(x) + 127) // 128) * 128


def conv3d_stage(name, t, hw, cin, cout, k, stride, count, bwd_dx=True):
    """One Conv3D (+BN+ReLU) stage, fwd+bwd, batch-1 per tower.

    FLOPs = 2*MACs; bwd = dX + dW convs (~2x fwd; conv1 skips dX).  MXU
    efficiency from padding the (K = kt*kh*kw*cin) x cout contraction to
    128x128 tiles.  HBM: activation in+out in bf16, ~5 sweeps across
    fwd+bwd (conv read/write, BN stats + normalize, bwd reads) — the same
    coarse model as the 2D table (tools/sol_table.py).
    """
    kt, kh, kw = k
    st, sp = stride
    t_out, hw_out = max(t // st, 1), hw // sp
    out_elems = t_out * hw_out * hw_out * cout
    macs = out_elems * kt * kh * kw * cin
    flops_fwd = 2 * macs
    flops = flops_fwd * (3 if bwd_dx else 2)
    K = kt * kh * kw * cin
    eff = (K / ceil128(K)) * (cout / ceil128(cout))
    in_elems = t * hw * hw * cin
    bytes_ = 2 * (in_elems + out_elems) * 5  # bf16, ~5 sweeps fwd+bwd
    return {
        "name": name, "count": count, "flops": flops * count,
        "eff": eff, "bytes": bytes_ * count,
        "t_mxu": flops * count / (PEAK * eff), "t_hbm": bytes_ * count / HBM,
    }


def model_stages(width=WIDTH, frames=FRAMES, size=SIZE, towers=TOWERS):
    """Per-sample stage table for MMTM3DCNN (models/mmtm_3dcnn.py):
    `towers` r3d-18 trunks (models/resnet3d.py) + 3 MMTM fusions
    (negligible FLOPs, counted as one stage)."""
    w = lambda c: int(c * width)
    stages = []
    t, hw = frames, size // 2
    stages.append(conv3d_stage("stem 3x7x7 s(1,2)", frames, size, 3, w(64), (3, 7, 7), (1, 2), towers, bwd_dx=False))
    # layer1: 4 convs 3^3 at full resolution
    stages.append(conv3d_stage("layer1 3^3", t, hw, w(64), w(64), (3, 3, 3), (1, 1), 4 * towers))
    for li, (cin, cout) in enumerate([(w(64), w(128)), (w(128), w(256)), (w(256), w(512))], start=2):
        stages.append(conv3d_stage(f"layer{li}_0 3^3 s2", t, hw, cin, cout, (3, 3, 3), (2, 2), towers))
        stages.append(conv3d_stage(f"layer{li} ds 1^3 s2", t, hw, cin, cout, (1, 1, 1), (2, 2), towers))
        t, hw = max(t // 2, 1), hw // 2
        stages.append(conv3d_stage(f"layer{li} 3^3", t, hw, cout, cout, (3, 3, 3), (1, 1), 3 * towers))
    # MMTM fusions + heads: tiny FC contractions, HBM-bound
    mmtm_flops = sum(2 * (towers * w(c) * (towers * w(c) // 4) * 2 + w(c) * w(c)) for c in (128, 256, 512))
    stages.append({"name": "mmtm2-4 + fc heads", "count": 1, "flops": 3 * mmtm_flops,
                   "eff": 0.25, "bytes": 2e5, "t_mxu": 3 * mmtm_flops / (PEAK * 0.25), "t_hbm": 2e5 / HBM})
    return stages


def measure(B, dtype, steps=20, warmup=5):
    from greedy_multimodal_learning_tpu.engine import create_train_state, make_optimizer
    from greedy_multimodal_learning_tpu.engine.bdr import GroupReducer
    from greedy_multimodal_learning_tpu.engine.steps import build_train_step, make_controller_update
    from greedy_multimodal_learning_tpu.models import MMTM3DCNN

    model = MMTM3DCNN(
        nclasses=NCLASSES, num_towers=TOWERS, width_multiplier=WIDTH, dtype=dtype,
        modality_names=("rgb", "depth", "flow"),
    )
    opt = make_optimizer(lr=0.1)
    shape = (B, TOWERS, FRAMES, SIZE, SIZE, 3)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), jnp.zeros(shape), num_modalities=TOWERS)
    gm = GroupReducer(state.params, [f"net_view_{i}" for i in range(TOWERS)], ["rgb", "depth", "flow"])
    step = build_train_step(
        model, opt, gm, make_controller_update("guided", TOWERS, epsilon=0.01, curation_windowsize=5)
    )
    r = np.random.default_rng(0)
    batches = [
        jax.device_put({
            "images": r.integers(0, 255, shape, dtype=np.uint8),
            "labels": r.integers(0, NCLASSES, (B,)).astype(np.int32),
            "mask": np.ones((B,), np.float32),
        })
        for _ in range(2)
    ]
    unlock = jnp.asarray(True)
    for i in range(warmup):
        state, out = step(state, batches[i % 2], unlock)
    float(out["loss"])
    t0 = time.perf_counter()
    for i in range(steps):
        state, out = step(state, batches[i % 2], unlock)
    float(out["loss"])
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[8, 64, 128])
    ap.add_argument("--json", default=None, help="write results to this JSON path")
    args = ap.parse_args()
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    stages = model_stages()
    flops_sample = sum(s["flops"] for s in stages)
    sol_sample = sum(max(s["t_mxu"], s["t_hbm"]) for s in stages)
    print(f"analytic (per sample, fwd+bwd, {TOWERS} towers, width {WIDTH}, "
          f"{FRAMES}f {SIZE}^2): {flops_sample/1e9:.2f} GFLOP, SoL {sol_sample*1e6:.0f} us")
    print("| stage (x count) | GFLOP | MXU eff | t_MXU us | t_HBM us | bound |")
    for s in stages:
        bound = "MXU" if s["t_mxu"] >= s["t_hbm"] else "HBM"
        print(f"| {s['name']} (x{s['count']}) | {s['flops']/1e9:.3f} | {s['eff']:.2f} "
              f"| {s['t_mxu']*1e6:.1f} | {s['t_hbm']*1e6:.1f} | {bound} |")

    # clip-corpus device-cache residency
    suite_bytes = (400 + 150) * TOWERS * FRAMES * SIZE * SIZE * 3
    real_bytes = (1050 + 482) * 3 * 64 * 112 * 112 * 3
    print(f"clip corpus: suite {suite_bytes/1e6:.1f} MB uint8 (HBM-resident, trivially fits); "
          f"real-NVGesture-scale estimate {real_bytes/1e9:.2f} GB uint8 "
          f"({'fits' if real_bytes < 12e9 else 'exceeds'} a 16 GB v5e chip alongside the model)")

    results = {"stages": [{k: s[k] for k in ("name", "count", "flops", "eff")} for s in stages],
               "flops_per_sample": flops_sample, "sol_per_sample_s": sol_sample,
               "suite_corpus_bytes": suite_bytes, "rows": []}
    for B in args.batches:
        for dtype, peak in ((jnp.float32, PEAK_F32), (jnp.bfloat16, PEAK)):
            if dtype == jnp.float32 and B != 8:
                continue  # f32 is the suite-operative path; measure at its batch
            dt = measure(B, dtype)
            sps = B / dt
            mfu = flops_sample * B / (dt * peak)
            sol_ratio = sol_sample * B / dt
            name = "f32" if dtype == jnp.float32 else "bf16"
            print(f"B={B} {name}: {dt*1e3:7.2f} ms/step  {sps:7.0f} samples/s/chip  "
                  f"MFU {mfu*100:5.1f}% (vs {'f32' if name=='f32' else 'bf16'} peak)  "
                  f"SoL-ratio {sol_ratio:.2f}", flush=True)
            results["rows"].append({"B": B, "dtype": name, "ms_per_step": dt * 1e3,
                                    "samples_per_sec": sps, "mfu": mfu, "sol_ratio": sol_ratio})
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
