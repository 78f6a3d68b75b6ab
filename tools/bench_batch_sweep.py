#!/usr/bin/env python3
"""Batch-size sweep of the compute-only train step (device-resident
batches): finds the throughput-optimal batch for the bench headline."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    for B in (128, 256, 384, 512):
        import jax.numpy as jnp

        state, step = bench._build(B)
        batches = [jax.device_put(bench._host_batch(s, B)) for s in (0, 1)]
        unlock = jnp.asarray(True)
        for i in range(4):
            state, out = step(state, batches[i % 2], unlock)
        float(out["loss"])
        t0 = time.perf_counter()
        n = 12
        for i in range(n):
            state, out = step(state, batches[i % 2], unlock)
        float(out["loss"])
        dt = (time.perf_counter() - t0) / n
        print(f"B={B}: {dt*1e3:.2f} ms/step -> {B/dt:.0f} samples/s", flush=True)
        del state, step, batches


if __name__ == "__main__":
    main()
