#!/usr/bin/env python3
"""Full-train-step A/B: MMTM gating via fused Pallas kernel vs XLA, and
the space-to-depth stem rewrite vs the standard 7×7 stride-2 conv1.

The decisive measurement for defaulting a variant on: the change inside
the real donated step (convs, BDR, optimizer, controller all present), not
an isolated microbenchmark (PERF.md's Pallas verdict methodology).
Variants:

  xla           — plain JAX gating (XLA fusion decides everything)
  pallas        — fused forward kernel + fused backward kernel
  pallas_fwd    — fused forward, plain-JAX VJP backward
  s2d           — plain gating + space-to-depth conv1 compute path
                  (models/resnet.py StemConv; numerics-preserving, pinned
                  by tests/test_models.py::test_stem_s2d_equivalence)

Run:  python tools/bench_step_ab.py [--batches 128 256] [--variants xla s2d]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

IMAGE = 224
NCLASSES = 40


def measure(B, use_pallas, pallas_bwd, stem_s2d=False, steps=20, warmup=5):
    from greedy_multimodal_learning_tpu.engine import create_train_state, make_optimizer
    from greedy_multimodal_learning_tpu.engine.bdr import GroupReducer
    from greedy_multimodal_learning_tpu.engine.steps import build_train_step, make_controller_update
    from greedy_multimodal_learning_tpu.models import MMTMMVCNN
    from greedy_multimodal_learning_tpu.ops import mmtm_pallas

    mmtm_pallas.PALLAS_BACKWARD = pallas_bwd
    model = MMTMMVCNN(
        nclasses=NCLASSES, num_towers=2, dtype=jnp.bfloat16,
        use_pallas=use_pallas, stem_s2d=stem_s2d,
    )
    opt = make_optimizer(lr=0.1)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), jnp.zeros((B, 2, IMAGE, IMAGE, 3)))
    gm = GroupReducer(state.params, ["net_view_0", "net_view_1"], ["visual", "skeleton"])
    step = build_train_step(
        model, opt, gm, make_controller_update("guided", 2, epsilon=0.01, curation_windowsize=5)
    )
    r = np.random.default_rng(0)
    batches = [
        jax.device_put(
            {
                "images": r.integers(0, 255, (B, 2, IMAGE, IMAGE, 3), dtype=np.uint8),
                "labels": r.integers(0, NCLASSES, (B,)).astype(np.int32),
                "mask": np.ones((B,), np.float32),
            }
        )
        for _ in range(2)
    ]
    unlock = jnp.asarray(True)
    for i in range(warmup):
        state, out = step(state, batches[i % 2], unlock)
    float(out["loss"])
    t0 = time.perf_counter()
    for i in range(steps):
        state, out = step(state, batches[i % 2], unlock)
    loss = float(out["loss"])
    dt = (time.perf_counter() - t0) / steps
    return dt, loss


VARIANTS = {
    # label: (use_pallas, pallas_bwd, stem_s2d)
    "xla": (False, False, False),
    "pallas": (True, True, False),
    "pallas_fwd": (True, False, False),
    "s2d": (False, False, True),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[128, 256])
    ap.add_argument("--variants", nargs="+", default=["xla", "pallas", "pallas_fwd"],
                    choices=sorted(VARIANTS))
    args = ap.parse_args()
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    for B in args.batches:
        rows = {}
        for label in args.variants:
            up, pb, s2d = VARIANTS[label]
            dt, loss = measure(B, up, pb, s2d)
            rows[label] = dt
            print(f"B={B} {label:11s}: {dt*1e3:7.2f} ms/step ({B/dt:6.0f} samples/s, loss {loss:.3f})", flush=True)
        base = rows.get("xla")
        if base:
            others = " | ".join(
                f"{k} vs xla: {base/v:.3f}x" for k, v in rows.items() if k != "xla"
            )
            if others:
                print(f"B={B} {others}", flush=True)


if __name__ == "__main__":
    main()
