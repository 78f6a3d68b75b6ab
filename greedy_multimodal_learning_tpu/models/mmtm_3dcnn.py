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

from .fusion import FUSION_WIDTHS, fused_towers_forward
from .mmtm import MMTM
from .resnet3d import ResNet3D18Trunk
from .. import config as cfg


class MMTM3DCNN(nn.Module):
    nclasses: int = 25
    num_towers: int = 3
    modality_names: Sequence[str] = ("rgb", "depth", "flow")
    mmtm_ratio: float = 4.0
    bug_compat: bool = False  # reference bug is 2-modality-specific
    SEonly: bool = False
    shareweight: bool = False
    use_pallas: bool = False  # n>2 falls back to the JAX path (kernel guard)
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
                SEonly=self.SEonly,
                shareweight=self.shareweight,
                bug_compat=self.bug_compat,
                use_pallas=self.use_pallas,
                dtype=self.dtype,
                name=f"mmtm{li}",
            )
            for li, width in FUSION_WIDTHS.items()
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
        return fused_towers_forward(
            self.towers,
            self.mmtms,
            feats,
            curation_mode=curation_mode,
            caring_modality=caring_modality,
            train=train,
            valid_mask=valid_mask,
            mmtm_off=mmtm_off,
            average_squeezemaps=average_squeezemaps,
            saving_scales=self.saving_mmtm_scales,
            saving_squeezes=self.saving_mmtm_squeeze_array,
        )


def build_3dcnn_from_config(dtype=None) -> MMTM3DCNN:
    """Construct from the ``MMTM_3DCNN`` gin surface."""
    q = lambda p, d: cfg.query("MMTM_3DCNN", p, d)
    names = q("modality_names", ["rgb", "depth", "flow"])
    dtype_name = q("compute_dtype", "float32") if dtype is None else dtype
    return MMTM3DCNN(
        nclasses=int(q("nclasses", 25)),
        num_towers=int(q("num_modalities", len(names))),
        modality_names=tuple(names),
        mmtm_ratio=float(q("mmtm_ratio", 4.0)),
        bug_compat=bool(q("bug_compat", False)),
        width_multiplier=float(q("width_multiplier", 1.0)),
        remat=bool(q("remat", False)),
        saving_mmtm_scales=bool(q("saving_mmtm_scales", False)),
        saving_mmtm_squeeze_array=bool(q("saving_mmtm_squeeze_array", False)),
        dtype=jnp.dtype(dtype_name) if isinstance(dtype_name, str) else dtype_name,
    )
