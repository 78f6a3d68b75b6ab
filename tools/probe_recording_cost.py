#!/usr/bin/env python3
"""Isolate why recording-mode eval steps are slow on the remote TPU.

Times 30 eval steps at batch 8 / 112x112 in four modes:
  A. saving flags OFF, hold outputs, one device_get at end
  B. saving flags ON,  hold outputs, one device_get at end
  C. saving flags ON,  per-step float(loss) sync (progress rendering)
  D. saving flags ON,  outputs packed into one array per kind per step
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from greedy_multimodal_learning_tpu.engine import create_train_state, make_optimizer
from greedy_multimodal_learning_tpu.engine.steps import build_eval_step
from greedy_multimodal_learning_tpu.models import MMTMMVCNN

B, IMG, NCLS = 8, 112, 40
STEPS = 30


def build(save_flags):
    model = MMTMMVCNN(
        nclasses=NCLS,
        num_towers=2,
        dtype=jnp.bfloat16,
        saving_mmtm_scales=save_flags,
        saving_mmtm_squeeze_array=save_flags,
    )
    optimizer = make_optimizer(lr=0.1)
    sample = jnp.zeros((B, 2, IMG, IMG, 3), jnp.float32)
    state = create_train_state(model, optimizer, jax.random.PRNGKey(0), sample)
    step = build_eval_step(model)
    batch = {
        "images": jax.device_put(np.random.randint(0, 255, (B, 2, IMG, IMG, 3), np.uint8)),
        "labels": jax.device_put(np.zeros((B,), np.int32)),
        "mask": jax.device_put(np.ones((B,), np.float32)),
    }
    return state, step, batch


def run(label, save_flags, per_step_sync=False, pack=False):
    state, step, batch = build(save_flags)
    new_mmtm, out = step(state, batch, None)  # compile
    jax.device_get(out["loss"])
    t0 = time.time()
    records = []
    for _ in range(STEPS):
        new_mmtm, out = step(state, batch, None)
        state = state.replace(mmtm=new_mmtm)
        if pack:
            for key in ("mmtmscales_list", "squeezedmaps_array_list"):
                if key in out:
                    out[key] = jnp.concatenate(
                        [v for mmtm in out[key] for v in mmtm], axis=1
                    )
        records.append(out)
        if per_step_sync:
            float(out["loss"])
    got = jax.device_get(records)
    dt = time.time() - t0
    print(f"{label}: {dt:.2f}s total, {dt / STEPS * 1000:.0f} ms/step", flush=True)
    return got


run("A off+bulk-fetch ", False)
run("B on +bulk-fetch ", True)
run("C on +step-sync  ", True, per_step_sync=True)
run("D on +packed     ", True, pack=True)
