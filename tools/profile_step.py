#!/usr/bin/env python3
"""Step-time attribution + MFU probes for the flagship train step (PERF.md).

Measures on the real chip:
  * full jitted train step at B in {128, 256} (bf16), fwd-only, and the
    fwd+bwd without optimizer/BDR -> attribution of the step's pieces,
  * conv1 in isolation (7x7 s2, 3->64): the 3-input-channel stem is the
    classic MXU-utilization sink; compared against a channel-dense conv of
    equal FLOPs to quantify the headroom a space-to-depth rewrite could buy,
  * MFU: analytic fwd+bwd FLOPs / step time / v5e bf16 peak (197 TFLOP/s).

Run:  python tools/profile_step.py [--batch 256]
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

V5E_BF16_PEAK_TFLOPS = 197.0
IMAGE = 224
NCLASSES = 40


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    float(np.asarray(leaves[0]).reshape(-1)[0])


def timeit_fn(fn, args, steps=20):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / steps


def resnet18_flops_per_sample(image=IMAGE):
    """Analytic MAC count for one ResNet-18 tower forward (2 MAC = 2 FLOP)."""
    h = image // 2  # conv1 stride 2
    flops = (h * h) * 64 * (7 * 7 * 3)
    h //= 2  # maxpool
    cin = 64
    for li, cout in enumerate([64, 128, 256, 512]):
        stride = 1 if li == 0 else 2
        hout = h // stride
        # block 0: conv1 (stride) + conv2 + (downsample if shape change)
        flops += (hout * hout) * cout * (3 * 3 * cin)
        flops += (hout * hout) * cout * (3 * 3 * cout)
        if stride != 1 or cin != cout:
            flops += (hout * hout) * cout * (1 * 1 * cin)
        # block 1
        flops += (hout * hout) * cout * (3 * 3 * cout) * 2
        cin, h = cout, hout
    flops += 512 * NCLASSES
    return 2 * flops  # MAC -> FLOP


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[128, 256])
    ap.add_argument("--steps", type=int, default=15)
    args = ap.parse_args()

    from greedy_multimodal_learning_tpu.data.transforms import preprocess
    from greedy_multimodal_learning_tpu.engine import create_train_state, make_optimizer
    from greedy_multimodal_learning_tpu.engine.bdr import GroupReducer
    from greedy_multimodal_learning_tpu.engine.metrics import blend_loss
    from greedy_multimodal_learning_tpu.engine.steps import build_train_step, make_controller_update
    from greedy_multimodal_learning_tpu.models import MMTMMVCNN

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    fwd_flops = 2 * resnet18_flops_per_sample()  # two towers
    train_flops = 3 * fwd_flops  # fwd + ~2x fwd for bwd

    for B in args.batches:
        model = MMTMMVCNN(nclasses=NCLASSES, num_towers=2, dtype=jnp.bfloat16)
        opt = make_optimizer(lr=0.1)
        state = create_train_state(model, opt, jax.random.PRNGKey(0), jnp.zeros((B, 2, IMAGE, IMAGE, 3)))
        gm = GroupReducer(state.params, ["net_view_0", "net_view_1"], ["visual", "skeleton"])
        step = build_train_step(
            model, opt, gm, make_controller_update("guided", 2, epsilon=0.01, curation_windowsize=5),
            donate=False,
        )
        r = np.random.default_rng(0)
        batch = jax.device_put(
            {
                "images": r.integers(0, 255, (B, 2, IMAGE, IMAGE, 3), dtype=np.uint8),
                "labels": r.integers(0, NCLASSES, (B,)).astype(np.int32),
                "mask": np.ones((B,), np.float32),
            }
        )
        unlock = jnp.asarray(True)

        t_step = timeit_fn(lambda s, b, u: step(s, b, u)[1]["loss"], (state, batch, unlock), args.steps)

        # forward only (train-mode stats, no grad)
        def fwd_only(params, b):
            x = preprocess(b["images"], train=True, rng=jax.random.PRNGKey(0), dtype=jnp.bfloat16)
            (blend, logits, _, _), _ = model.apply(
                {"params": params, "batch_stats": state.batch_stats, "mmtm": state.mmtm},
                x, jnp.asarray(False), jnp.asarray(0, jnp.int32),
                train=True, valid_mask=b["mask"], mutable=["batch_stats", "mmtm"],
            )
            return blend_loss(logits, b["labels"], b["mask"])

        t_fwd = timeit_fn(jax.jit(fwd_only), (state.params, batch), args.steps)

        # fwd+bwd without optimizer/BDR/controller.  Reduce over ALL grad
        # leaves so XLA cannot dead-code-eliminate any of the backward, and
        # the program output stays scalar (big outputs distort timing on
        # this remote backend: every per-call output buffer is an RPC).
        def full_grad_norm(p, b):
            g = jax.grad(fwd_only)(p, b)
            return sum(jnp.sum(leaf.astype(jnp.float32) ** 2) for leaf in jax.tree_util.tree_leaves(g))

        t_fb = timeit_fn(jax.jit(full_grad_norm), (state.params, batch), args.steps)

        mfu = train_flops * B / t_step / (V5E_BF16_PEAK_TFLOPS * 1e12)
        print(
            f"B={B}: step {t_step*1e3:.2f} ms ({B/t_step:.0f} samples/s) | "
            f"fwd {t_fwd*1e3:.2f} ms | fwd+bwd {t_fb*1e3:.2f} ms | "
            f"opt/BDR/ctrl {max(t_step-t_fb,0)*1e3:.2f} ms | MFU {100*mfu:.1f}%",
            flush=True,
        )

        # conv1 isolation: actual stem conv vs channel-dense same-FLOPs conv
        x224 = jnp.asarray(r.normal(size=(B, IMAGE, IMAGE, 3)), jnp.bfloat16)
        k7 = jnp.asarray(r.normal(size=(7, 7, 3, 64)) * 0.05, jnp.bfloat16)

        # scalar-reduced outputs: a raw conv output (50+ MB) per call makes
        # the remote backend's buffer management dominate the measurement
        conv1 = jax.jit(
            lambda x, k: jnp.sum(
                jax.lax.conv_general_dilated(
                    x, k, (2, 2), [(3, 3), (3, 3)], dimension_numbers=("NHWC", "HWIO", "NHWC")
                ).astype(jnp.float32)
            )
        )
        t_c1 = timeit_fn(conv1, (x224, k7), args.steps)
        # channel-dense comparator: 112x112x48 input, 4x4 kernel stride 1 has
        # identical output shape and near-identical MACs (48*16 = 3*256? ->
        # use 12 channels, 4x4, stride 1 on 112^2: 12*16=192 vs 3*49=147 MACs)
        x12 = jnp.asarray(r.normal(size=(B, 112, 112, 12)), jnp.bfloat16)
        k4 = jnp.asarray(r.normal(size=(4, 4, 12, 64)) * 0.05, jnp.bfloat16)
        conv_dense = jax.jit(
            lambda x, k: jnp.sum(
                jax.lax.conv_general_dilated(
                    x, k, (1, 1), [(2, 1), (2, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
                ).astype(jnp.float32)
            )
        )
        t_cd = timeit_fn(conv_dense, (x12, k4), args.steps)
        c1_flops = 2 * (112 * 112) * 64 * (7 * 7 * 3) * B
        cd_flops = 2 * (111 * 111) * 64 * (4 * 4 * 12) * B
        print(
            f"  conv1 7x7s2(3ch): {t_c1*1e3:.2f} ms ({c1_flops/t_c1/1e12:.1f} TFLOP/s) | "
            f"space-to-depth comparator 4x4s1(12ch): {t_cd*1e3:.2f} ms ({cd_flops/t_cd/1e12:.1f} TFLOP/s) | "
            f"2 towers x (fwd + ~2x bwd) stem share of step: {6*t_c1/t_step*100:.1f}%",
            flush=True,
        )


if __name__ == "__main__":
    main()
