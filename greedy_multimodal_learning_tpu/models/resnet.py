"""ResNet-18 backbone, torchvision-compatible, NHWC, TPU-first.

The reference uses stock ``torchvision.models.resnet18`` towers
(reference: src/model.py:53-56).  This is a fresh flax implementation whose
parameter layout/initialization/BN semantics match torchvision so that (a)
reference checkpoints can be ingested for numeric parity tests and (b)
training trajectories are statistically comparable.

Exposed as a *headless trunk API*: the MVCNN fusion model drives the stem and
each layer group separately so MMTM modules can be interleaved between layer
groups (reference: src/model.py:63-97).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import TorchBatchNorm, TorchLinear, conv3x3, conv1x1, kaiming_normal_fan_out


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, mask=None):
        identity = x
        out = conv3x3(self.features, self.stride, self.dtype, name="conv1")(x)
        out = TorchBatchNorm(dtype=self.dtype, name="bn1")(out, use_running_average=not train, mask=mask)
        out = nn.relu(out)
        out = conv3x3(self.features, 1, self.dtype, name="conv2")(out)
        out = TorchBatchNorm(dtype=self.dtype, name="bn2")(out, use_running_average=not train, mask=mask)
        if self.downsample:
            identity = conv1x1(self.features, self.stride, self.dtype, name="downsample_conv")(x)
            identity = TorchBatchNorm(dtype=self.dtype, name="downsample_bn")(
                identity, use_running_average=not train, mask=mask
            )
        return nn.relu(out + identity)


class ResNet18Trunk(nn.Module):
    """Stem + 4 layer groups + global-average head of torchvision resnet18,
    with each stage callable separately for fusion interleaving."""

    nclasses: int = 40
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # per-block rematerialization: trade ~1 extra
    # forward for O(depth) less activation memory (large-batch training)

    def setup(self):
        block_cls = nn.remat(BasicBlock, static_argnums=(2,)) if self.remat else BasicBlock
        self.conv1 = nn.Conv(
            64,
            (7, 7),
            strides=(2, 2),
            padding=((3, 3), (3, 3)),
            use_bias=False,
            kernel_init=kaiming_normal_fan_out(),
            dtype=self.dtype,
            name="conv1",
        )
        self.bn1 = TorchBatchNorm(dtype=self.dtype, name="bn1")
        widths = (64, 128, 256, 512)
        blocks = []
        for li, width in enumerate(widths):
            stride = 1 if li == 0 else 2
            blocks.append(
                (
                    block_cls(width, stride, downsample=(li > 0), dtype=self.dtype, name=f"layer{li + 1}_0"),
                    block_cls(width, 1, downsample=False, dtype=self.dtype, name=f"layer{li + 1}_1"),
                )
            )
        self.blocks = blocks
        self.fc = TorchLinear(self.nclasses, dtype=self.dtype, name="fc")

    def stem(self, x, train: bool, mask=None):
        x = self.conv1(x)
        x = self.bn1(x, use_running_average=not train, mask=mask)
        x = nn.relu(x)
        # torch MaxPool2d(kernel_size=3, stride=2, padding=1); pad with -inf
        # so the padding never wins the max.
        x = nn.max_pool(
            x,
            (3, 3),
            strides=(2, 2),
            padding=((1, 1), (1, 1)),
        )
        return x

    def layer(self, i: int, x, train: bool, mask=None):
        """Run layer group i (1-based, mirroring torchvision layer1..layer4)."""
        b0, b1 = self.blocks[i - 1]
        x = b0(x, train, mask)
        x = b1(x, train, mask)
        return x

    def head(self, x):
        """Global average pool (AdaptiveAvgPool2d((1,1)) equivalent) + fc."""
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(self.dtype)
        return self.fc(x)

    def __call__(self, x, train: bool = False, mask=None):
        x = self.stem(x, train, mask)
        for i in (1, 2, 3, 4):
            x = self.layer(i, x, train, mask)
        return self.head(x)
