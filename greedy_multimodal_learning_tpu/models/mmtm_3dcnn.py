"""MMTM_3DCNN — N-modality 3D-CNN classifier with MMTM fusion.

The NVGesture-style configuration from the MMTM paper lineage
(BASELINE.json config 4: RGB + depth + optical-flow towers).  Same fusion
topology as MMTM_MVCNN (fusion after layer groups 2/3/4 at widths
128/256/512, ratio 4) with 3D trunks and per-modality clip inputs.

Inputs: a list of per-modality clips, each (B, T, H, W, C_i), or a stacked
(B, M, T, H, W, C) array when all modalities share channel count.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .mmtm import MMTM
from .resnet3d import ResNet3D18Trunk
from .. import config as cfg


class MMTM3DCNN(nn.Module):
    nclasses: int = 25
    num_towers: int = 3
    modality_names: Sequence[str] = ("rgb", "depth", "flow")
    mmtm_ratio: float = 4.0
    bug_compat: bool = False  # reference bug is 2-modality-specific
    width_multiplier: float = 1.0
    remat: bool = False
    dtype: jnp.dtype = jnp.float32
    saving_mmtm_scales: bool = False
    saving_mmtm_squeeze_array: bool = False

    def setup(self):
        n = self.num_towers
        w = lambda c: int(c * self.width_multiplier)
        self.towers = [
            ResNet3D18Trunk(
                nclasses=self.nclasses,
                width_multiplier=self.width_multiplier,
                remat=self.remat,
                dtype=self.dtype,
                name=f"net_view_{i}",
            )
            for i in range(n)
        ]
        self.mmtms = {
            li: MMTM(
                dims=[w(width)] * n,
                ratio=self.mmtm_ratio,
                modality_names=tuple(self.modality_names),
                bug_compat=self.bug_compat,
                dtype=self.dtype,
                name=f"mmtm{li}",
            )
            for li, width in ((2, 128), (3, 256), (4, 512))
        }

    def __call__(
        self,
        x,
        curation_mode=None,
        caring_modality=None,
        *,
        train: bool = False,
        valid_mask: Optional[jnp.ndarray] = None,
        mmtm_off: bool = False,
        average_squeezemaps: Optional[Sequence] = None,
    ):
        n = self.num_towers
        if not isinstance(x, (list, tuple)):
            x = [x[:, i] for i in range(n)]
        feats = [self.towers[i].stem(x[i].astype(self.dtype), train, valid_mask) for i in range(n)]
        feats = [self.towers[i].layer(1, feats[i], train, valid_mask) for i in range(n)]

        scales = []
        squeezed_mps = []
        for li in (2, 3, 4):
            feats = [self.towers[i].layer(li, feats[i], train, valid_mask) for i in range(n)]
            feats, scale, squeezed = self.mmtms[li](
                feats,
                curation_mode=curation_mode,
                caring_modality=caring_modality,
                turnoff_cross_modal_flow=mmtm_off,
                average_squeezemaps=average_squeezemaps[li - 1] if mmtm_off else None,
                valid_mask=valid_mask,
                return_scale=self.saving_mmtm_scales,
                return_squeezed_mps=self.saving_mmtm_squeeze_array,
            )
            scales.append(scale)
            squeezed_mps.append(squeezed)

        logits = [self.towers[i].head(feats[i]).astype(jnp.float32) for i in range(n)]
        blend = sum(logits) / float(n)
        return blend, logits, scales, squeezed_mps


def build_3dcnn_from_config(dtype=None) -> MMTM3DCNN:
    """Construct from the ``MMTM_3DCNN`` gin surface."""
    q = lambda p, d: cfg.query("MMTM_3DCNN", p, d)
    names = q("modality_names", ["rgb", "depth", "flow"])
    dtype_name = q("compute_dtype", "float32") if dtype is None else dtype
    return MMTM3DCNN(
        nclasses=int(q("nclasses", 25)),
        num_towers=int(q("num_modalities", len(names))),
        modality_names=tuple(names),
        width_multiplier=float(q("width_multiplier", 1.0)),
        saving_mmtm_scales=bool(q("saving_mmtm_scales", False)),
        saving_mmtm_squeeze_array=bool(q("saving_mmtm_squeeze_array", False)),
        dtype=jnp.dtype(dtype_name) if isinstance(dtype_name, str) else dtype_name,
    )
