"""Device-side image preprocessing (jit-compiled, runs inside the step).

Reproduces the reference's transform stacks (reference: src/dataset.py:35-47):

* test: ToTensor (u8 HWC -> f32 CHW /255) + ImageNet mean/std normalize,
* train: additionally RandomHorizontalFlip(p=0.5) — applied independently
  per (sample, view), matching the reference's per-view transform loop
  (reference: src/dataset.py:121-127).

TPU-first: batches arrive as uint8 NHWC; the float conversion, normalize and
flip are fused by XLA into the first conv's input pipeline.  Flip decisions
come from a JAX PRNG key folded per step (statistical parity — bitwise RNG
parity with torch is impossible, SURVEY §7 hard part 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .modelnet import IMAGENET_MEAN, IMAGENET_STD


def preprocess(images_u8, *, train: bool, rng=None, dtype=jnp.float32):
    """uint8 (B, V, ..., H, W, C) -> normalized dtype array, optional random
    horizontal flip (per (sample, view/modality)).  Works for image stacks
    (B, V, H, W, C) and video clips (B, M, T, H, W, C) alike: the flip is
    along the width axis (-2)."""
    x = images_u8.astype(jnp.float32) / 255.0
    if train:
        if rng is None:
            raise ValueError("train preprocessing requires an rng key")
        b, v = images_u8.shape[0], images_u8.shape[1]
        flip = jax.random.bernoulli(rng, 0.5, (b, v)).reshape((b, v) + (1,) * (x.ndim - 2))
        x = jnp.where(flip, jnp.flip(x, axis=-2), x)
    bshape = (1,) * (x.ndim - 1) + (3,)
    mean = jnp.asarray(IMAGENET_MEAN).reshape(bshape)
    std = jnp.asarray(IMAGENET_STD).reshape(bshape)
    x = (x - mean) / std
    return x.astype(dtype)
