"""Building-block layers with torchvision-compatible semantics.

The parity target (BASELINE.md: top-1 within ±0.5% of the reference) demands
matching torchvision's ResNet-18 numerics: BatchNorm running-stat updates
(momentum 0.1, unbiased batch variance into the running buffer, biased for
normalization), kaiming-normal fan-out conv init, and torch's default Linear
init.  All stats are computed in float32 regardless of compute dtype.

``mask`` support: the TPU pipeline pads the last partial batch to a static
shape (XLA requires static shapes); BatchNorm and all reductions weight
samples by a (B,) validity mask so padded rows are invisible to statistics —
semantically identical to the reference's variable-size final batch
(reference torch DataLoader default drop_last=False, src/dataset.py:55-90).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def kaiming_normal_fan_out():
    """torch.nn.init.kaiming_normal_(mode='fan_out', nonlinearity='relu'),
    the conv init used by torchvision ResNet."""
    return nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch.nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)).

    flax Linear kernels are (in, out); torch fan_in is shape[0] here.
    """
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in):
    bound = 1.0 / float(fan_in) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchLinear(nn.Module):
    """nn.Dense with torch.nn.Linear's default initialization."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param("kernel", torch_linear_kernel_init, (in_features, self.features))
        bias = self.param("bias", torch_linear_bias_init(in_features), (self.features,))
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        return y + bias.astype(self.dtype)


class TorchBatchNorm(nn.Module):
    """BatchNorm2d with exact torch semantics.

    * running = (1 - momentum) * running + momentum * batch_stat
      with momentum 0.1 (torch default),
    * the running variance is updated with the *unbiased* batch variance
      (x n/(n-1)) while normalization uses the biased one,
    * optional (B,) ``mask`` excludes padded samples from batch statistics,
    * stats and running buffers are float32.

    Expects NHWC (or (B, C) for 1D use).
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool, mask: Optional[jnp.ndarray] = None):
        features = x.shape[-1]
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
                # Broadcast (B,) mask over spatial dims.
                m = mask.astype(jnp.float32).reshape((-1,) + (1,) * (x.ndim - 1))
                per_sample_elems = 1.0
                for d in x.shape[1:-1]:
                    per_sample_elems *= d
                n = jnp.sum(mask.astype(jnp.float32)) * per_sample_elems
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

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (xf - mean) * inv + bias
        return y.astype(self.dtype)


def conv3x3(features, stride=1, dtype=jnp.float32, name=None):
    return nn.Conv(
        features,
        (3, 3),
        strides=(stride, stride),
        padding=((1, 1), (1, 1)),
        use_bias=False,
        kernel_init=kaiming_normal_fan_out(),
        dtype=dtype,
        name=name,
    )


def conv1x1(features, stride=1, dtype=jnp.float32, name=None):
    return nn.Conv(
        features,
        (1, 1),
        strides=(stride, stride),
        padding="VALID",
        use_bias=False,
        kernel_init=kaiming_normal_fan_out(),
        dtype=dtype,
        name=name,
    )
