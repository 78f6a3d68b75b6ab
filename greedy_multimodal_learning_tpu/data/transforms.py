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
    along the width axis (-2).

    HBM-lean: when the compute dtype is half-precision, all arithmetic runs
    in that dtype (input quantization is already 1/255, so the extra
    rounding is negligible), and normalize folds into a single FMA
    ``x * (1/(255*std)) - mean/std``."""
    compute = jnp.float32 if dtype == jnp.float32 else jnp.dtype(dtype)
    x = images_u8.astype(compute)
    if train:
        if rng is None:
            raise ValueError("train preprocessing requires an rng key")
        b, v = images_u8.shape[0], images_u8.shape[1]
        if x.ndim >= 6:
            # Video clips (B, M, T, H, W, C): axis 1 is MODALITIES of one
            # scene, so the flip must be shared across them — independent
            # per-modality flips would feed the fusion spatially mismatched
            # pairs.  (Flow x-components are not sign-inverted; disable
            # flip augmentation for flow-bearing modalities if that
            # matters for your data.)
            flip = jax.random.bernoulli(rng, 0.5, (b,)).reshape((b,) + (1,) * (x.ndim - 1))
        else:
            # Multiview images (B, V, H, W, C): independent per-view flips,
            # exactly the reference's per-view RandomHorizontalFlip
            # (reference: src/dataset.py:41-47 applies the transform per view)
            flip = jax.random.bernoulli(rng, 0.5, (b, v)).reshape((b, v) + (1,) * (x.ndim - 2))
        x = jnp.where(flip, jnp.flip(x, axis=-2), x)
    bshape = (1,) * (x.ndim - 1) + (3,)
    scale = jnp.asarray(1.0 / (255.0 * IMAGENET_STD), compute).reshape(bshape)
    bias = jnp.asarray(IMAGENET_MEAN / IMAGENET_STD, compute).reshape(bshape)
    x = x * scale - bias
    return x.astype(dtype)
