#!/usr/bin/env python3
"""MFU-gap probes (VERDICT r2 #5): measure the three candidate levers the
extended roofline (tools/sol_table.py) identifies against the ~40% MFU /
~100%-of-modeled-SoL train step.

  b512     train-step time at B=512 (vs B=256): does a bigger batch close
           any scheduling slack?
  bnfold   eval forward at B=256, stock vs BN-folded-into-conv weights
           (running stats folded into the kernel + a bias; numerically
           equivalent, verified per-logit before timing).
  bf16norm train step with the BN *normalize* arithmetic in compute dtype
           (reductions/running stats stay f32) — tests whether the f32
           upcast in TorchBatchNorm costs bandwidth or VPU time.

Methodology (PERF.md "microbenchmark methodology caveat"): device-resident
batches, scalar-reduced outputs, warmup, host-value fetch as the only sync.

Usage: python3 tools/mfu_probe.py [--probes b512 bnfold bf16norm]
"""

import argparse
import sys
import time

import numpy as np

IMAGE = 224
NCLASSES = 40
FLOPS_PER_SAMPLE_TRAIN = 21.3e9  # tools/sol_table.py at 224^2, fwd+bwd
PEAK = 197e12


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _build_train(batch_size, dtype=None):
    import jax
    import jax.numpy as jnp

    from greedy_multimodal_learning_tpu.engine import create_train_state, make_optimizer
    from greedy_multimodal_learning_tpu.engine.bdr import GroupReducer
    from greedy_multimodal_learning_tpu.engine.steps import build_train_step, make_controller_update
    from greedy_multimodal_learning_tpu.models import MMTMMVCNN

    model = MMTMMVCNN(nclasses=NCLASSES, num_towers=2, dtype=dtype or jnp.bfloat16)
    optimizer = make_optimizer(lr=0.1)
    sample = jnp.zeros((batch_size, 2, IMAGE, IMAGE, 3), jnp.float32)
    state = create_train_state(model, optimizer, jax.random.PRNGKey(0), sample)
    gm = GroupReducer(state.params, ["net_view_0", "net_view_1"], ["visual", "skeleton"])
    ctrl = make_controller_update("guided", 2, epsilon=0.01, curation_windowsize=5)
    return state, build_train_step(model, optimizer, gm, ctrl), model


def _device_batch(batch_size, seed=0):
    import jax

    r = np.random.default_rng(seed)
    return jax.device_put({
        "images": r.integers(0, 255, (batch_size, 2, IMAGE, IMAGE, 3), dtype=np.uint8),
        "labels": r.integers(0, NCLASSES, (batch_size,)).astype(np.int32),
        "mask": np.ones((batch_size,), np.float32),
    })


def _time_train(state, step, batches, steps, warmup):
    import jax.numpy as jnp

    unlock = jnp.asarray(True)
    out = None
    for i in range(warmup):
        state, out = step(state, batches[i % len(batches)], unlock)
    float(out["loss"])
    t0 = time.perf_counter()
    for i in range(steps):
        state, out = step(state, batches[i % len(batches)], unlock)
    float(out["loss"])
    return (time.perf_counter() - t0) / steps


def probe_b512(steps=12, warmup=4):
    results = {}
    for B in (256, 512):
        state, step, _ = _build_train(B)
        batches = [_device_batch(B, s) for s in (0, 1)]
        dt = _time_train(state, step, batches, steps, warmup)
        mfu = B * FLOPS_PER_SAMPLE_TRAIN / dt / PEAK
        results[f"B{B}"] = {"step_ms": round(dt * 1e3, 2), "samples_per_sec": round(B / dt, 1),
                            "mfu_pct": round(100 * mfu, 1)}
        log(f"b512 probe B={B}: {dt*1e3:.2f} ms/step, {B/dt:.0f} samples/s, MFU {100*mfu:.1f}%")
        del state, step, batches
    return results


from greedy_multimodal_learning_tpu.engine.fold_bn import fold_batchnorm  # noqa: E402


def probe_bnfold(B=256, steps=12, warmup=4):
    import jax
    import jax.numpy as jnp

    from greedy_multimodal_learning_tpu.data.transforms import preprocess
    from greedy_multimodal_learning_tpu.engine import create_train_state, make_optimizer
    from greedy_multimodal_learning_tpu.models import MMTMMVCNN

    model = MMTMMVCNN(nclasses=NCLASSES, num_towers=2, dtype=jnp.bfloat16)
    sample = jnp.zeros((B, 2, IMAGE, IMAGE, 3), jnp.float32)
    state = create_train_state(model, make_optimizer(lr=0.1), jax.random.PRNGKey(0), sample)
    # make running stats non-trivial so folding is actually exercised
    bs = jax.tree_util.tree_map(lambda x: x, state.batch_stats)

    def perturb(t, key=[0]):
        def f(x):
            key[0] += 1
            r = jax.random.PRNGKey(key[0])
            return x + jax.random.uniform(r, x.shape, x.dtype, 0.05, 0.5)
        return jax.tree_util.tree_map(f, t)

    bs = perturb(bs)
    batch = _device_batch(B)

    def fwd(params, batch_stats, images, mask):
        x = preprocess(images, train=False, dtype=model.dtype)
        (blend, logits, _, _), _ = model.apply(
            {"params": params, "batch_stats": batch_stats, "mmtm": state.mmtm},
            x, train=False, valid_mask=mask, mutable=["mmtm"],
        )
        return blend

    jfwd = jax.jit(lambda p, s, im, m: fwd(p, s, im, m).astype(jnp.float32).sum())
    jfull = jax.jit(fwd)

    fp, fs = fold_batchnorm(state.params, bs)
    # numerical equivalence first
    a = np.asarray(jfull(state.params, bs, batch["images"], batch["mask"]), np.float32)
    b = np.asarray(jfull(fp, fs, batch["images"], batch["mask"]), np.float32)
    err = float(np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9))
    log(f"bnfold: max relative logit deviation {err:.2e}")

    results = {"max_rel_dev": err}
    for name, (p, s) in (("stock", (state.params, bs)), ("folded", (fp, fs))):
        for _ in range(warmup):
            v = jfwd(p, s, batch["images"], batch["mask"])
        float(v)
        t0 = time.perf_counter()
        for _ in range(steps):
            v = jfwd(p, s, batch["images"], batch["mask"])
        float(v)
        dt = (time.perf_counter() - t0) / steps
        results[name] = {"eval_ms": round(dt * 1e3, 2), "samples_per_sec": round(B / dt, 1)}
        log(f"bnfold probe {name}: {dt*1e3:.2f} ms/eval-fwd at B={B}")
    return results


def probe_bf16norm(B=256, steps=12, warmup=4):
    import jax
    import jax.numpy as jnp

    from greedy_multimodal_learning_tpu.models import layers as L

    orig = L.TorchBatchNorm.__call__
    results = {}

    def fast_call(self, x, use_running_average, mask=None):
        """BN with reductions in f32 (stats/running buffers unchanged) but
        the normalize applied in compute dtype — the probe variant."""
        features = x.shape[-1]
        from flax import linen as nn
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((features,), jnp.float32))
        xf = x.astype(jnp.float32)
        reduce_axes = tuple(range(x.ndim - 1))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            if mask is not None:
                m = mask.astype(jnp.float32).reshape((-1,) + (1,) * (x.ndim - 1))
                per = 1.0
                for d in x.shape[1:-1]:
                    per *= d
                n = jnp.sum(mask.astype(jnp.float32)) * per
                mean = jnp.sum(xf * m, axis=reduce_axes) / n
                var = jnp.sum(jnp.square(xf - mean) * m, axis=reduce_axes) / n
            else:
                n = 1.0
                for d in x.shape[:-1]:
                    n *= d
                n = jnp.asarray(n, jnp.float32)
                mean = jnp.mean(xf, axis=reduce_axes)
                var = jnp.var(xf, axis=reduce_axes)
            if not self.is_initializing():
                unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
                ra_mean.value = (1.0 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1.0 - self.momentum) * ra_var.value + self.momentum * unbiased
        inv = (jax.lax.rsqrt(var + self.epsilon) * scale).astype(self.dtype)
        # normalize in compute dtype: no f32 materialization of the map
        return (x.astype(self.dtype) - mean.astype(self.dtype)) * inv + bias.astype(self.dtype)

    # A raw function assigned to Module.__call__ bypasses flax's metaclass
    # method management (self.param would raise); re-apply the compact
    # marker and flax's method wrapper to the probe variant.
    from flax import linen as nn
    from flax.linen import module as flax_module

    patched = flax_module.wrap_method_once(nn.compact(fast_call))

    for name, call in (("stock_f32norm", orig), ("bf16norm", patched)):
        L.TorchBatchNorm.__call__ = call
        try:
            state, step, _ = _build_train(B)
            batches = [_device_batch(B, s) for s in (0, 1)]
            dt = _time_train(state, step, batches, steps, warmup)
            mfu = B * FLOPS_PER_SAMPLE_TRAIN / dt / PEAK
            results[name] = {"step_ms": round(dt * 1e3, 2), "mfu_pct": round(100 * mfu, 1)}
            log(f"bf16norm probe {name}: {dt*1e3:.2f} ms/step, MFU {100*mfu:.1f}%")
            del state, step, batches
        finally:
            L.TorchBatchNorm.__call__ = orig
    return results


def main():
    import jax
    ap = argparse.ArgumentParser()
    ap.add_argument("--probes", nargs="+", default=["b512", "bnfold", "bf16norm"],
                    choices=["b512", "bnfold", "bf16norm"])
    args = ap.parse_args()
    log(f"devices: {jax.devices()}")
    out = {}
    for p in args.probes:
        # isolate probes: one failure must not discard the others' results
        try:
            out[p] = {"b512": probe_b512, "bnfold": probe_bnfold, "bf16norm": probe_bf16norm}[p]()
        except Exception as e:
            import traceback

            traceback.print_exc(file=sys.stderr)
            out[p] = {"error": repr(e)}
    import json
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
