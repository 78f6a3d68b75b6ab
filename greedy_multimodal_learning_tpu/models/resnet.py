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
from jax import lax

from .layers import TorchBatchNorm, TorchLinear, conv3x3, conv1x1, kaiming_normal_fan_out


class StemConv(nn.Module):
    """torchvision's conv1 (7×7 stride-2, pad 3, no bias) with a
    flag-selectable space-to-depth compute path.

    The parameter is ALWAYS the standard ``(7, 7, C, features)`` kernel at
    the same tree path (``conv1/kernel``) with the same initializer, so
    checkpoints, torch interop, and BN folding are unaffected by the flag.
    With ``s2d=True`` the same convolution is computed as a 4×4 stride-1
    conv over the 2×2 space-to-depth rearrangement of the input: the 7×7
    kernel is zero-padded to 8×8 (tap offset −4 never occurs) and
    regrouped into (4, 4, 4C, features); identical sums in a different
    association order, so outputs match the standard path to float
    tolerance.  Motivation (PERF.md roofline): a stride-2 7×7 conv on 3
    channels tiles poorly onto the 128×128 MXU; the rearranged form is a
    denser stride-1 contraction over 4C input channels.
    """

    features: int = 64
    s2d: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param("kernel", kaiming_normal_fan_out(), (7, 7, in_ch, self.features))
        kernel = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        if not self.s2d:
            return lax.conv_general_dilated(
                x, kernel, (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        B, H, W, C = x.shape
        if H % 2 or W % 2:
            raise ValueError(f"space-to-depth stem needs even spatial dims, got {(H, W)}")
        # x[2p+dy, 2q+dx, c] -> xs[p, q, (dy*2+dx)*C + c]
        xs = (
            x.reshape(B, H // 2, 2, W // 2, 2, C)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(B, H // 2, W // 2, 4 * C)
        )
        # tap offset u-3 = 2(b-2)+dy with t = u+1 = 2b+dy in 1..7; pad t=0
        k8 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        ks = (
            k8.reshape(4, 2, 4, 2, in_ch, self.features)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(4, 4, 4 * in_ch, self.features)
        )
        # output i reads blocks i-2 .. i+1  ->  padding (2, 1)
        return lax.conv_general_dilated(
            xs, ks, (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


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
    stem_s2d: bool = False  # space-to-depth conv1 compute path (StemConv)

    def setup(self):
        block_cls = nn.remat(BasicBlock, static_argnums=(2,)) if self.remat else BasicBlock
        self.conv1 = StemConv(features=64, s2d=self.stem_s2d, dtype=self.dtype, name="conv1")
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
