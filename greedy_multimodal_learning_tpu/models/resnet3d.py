"""3D ResNet-18 trunk (r3d_18-style) for video/gesture modalities.

Supports the NVGesture-style 3-modality configuration (BASELINE.json
config 4): the reference repo itself only ships the 2D ModelNet40 model, so
this family is new capability following the same trunk API as
models/resnet.py (stem / layer(i) / head callable separately for MMTM
interleaving).  Layout is NDHWC (TPU-native channels-last).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import TorchBatchNorm, TorchLinear, kaiming_normal_fan_out


def conv3d(features, kernel, stride, dtype, name=None):
    pads = tuple((k // 2, k // 2) for k in kernel)
    return nn.Conv(
        features,
        kernel,
        strides=stride,
        padding=pads,
        use_bias=False,
        kernel_init=kaiming_normal_fan_out(),
        dtype=dtype,
        name=name,
    )


class BasicBlock3D(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, mask=None):
        s = (self.stride,) * 3
        identity = x
        out = conv3d(self.features, (3, 3, 3), s, self.dtype, name="conv1")(x)
        out = TorchBatchNorm(dtype=self.dtype, name="bn1")(out, use_running_average=not train, mask=mask)
        out = nn.relu(out)
        out = conv3d(self.features, (3, 3, 3), (1, 1, 1), self.dtype, name="conv2")(out)
        out = TorchBatchNorm(dtype=self.dtype, name="bn2")(out, use_running_average=not train, mask=mask)
        if self.downsample:
            identity = nn.Conv(
                self.features,
                (1, 1, 1),
                strides=s,
                padding="VALID",
                use_bias=False,
                kernel_init=kaiming_normal_fan_out(),
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            identity = TorchBatchNorm(dtype=self.dtype, name="downsample_bn")(
                identity, use_running_average=not train, mask=mask
            )
        return nn.relu(out + identity)


class ResNet3D18Trunk(nn.Module):
    """Stem + 4 layer groups + global-average head; input (B, T, H, W, C)."""

    nclasses: int = 25
    width_multiplier: float = 1.0
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        block_cls = nn.remat(BasicBlock3D, static_argnums=(2,)) if self.remat else BasicBlock3D
        w = lambda c: int(c * self.width_multiplier)
        self.conv1 = nn.Conv(
            w(64),
            (3, 7, 7),
            strides=(1, 2, 2),
            padding=((1, 1), (3, 3), (3, 3)),
            use_bias=False,
            kernel_init=kaiming_normal_fan_out(),
            dtype=self.dtype,
            name="conv1",
        )
        self.bn1 = TorchBatchNorm(dtype=self.dtype, name="bn1")
        blocks = []
        for li, width in enumerate((w(64), w(128), w(256), w(512))):
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
        return nn.relu(x)

    def layer(self, i: int, x, train: bool, mask=None):
        b0, b1 = self.blocks[i - 1]
        return b1(b0(x, train, mask), train, mask)

    def head(self, x):
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3)).astype(self.dtype)
        return self.fc(x)

    def __call__(self, x, train: bool = False, mask=None):
        x = self.stem(x, train, mask)
        for i in (1, 2, 3, 4):
            x = self.layer(i, x, train, mask)
        return self.head(x)
