"""MMTM_MVCNN — N-tower multi-view CNN with MMTM fusion at three depths.

Behavioral spec from the reference model (reference: src/model.py:16-108):
per-view ResNet-18 towers, MMTM fusion after layer groups 2/3/4 at channel
widths 128/256/512 (ratio 4), global-average heads, blended logits
``mean(per-view logits)``.  Generalized to N modalities (the reference
hardcodes 2; the BASELINE config 4 requires a 3-modality variant).

TPU-first departures from the reference:
* NHWC layout, static shapes, (B,) validity mask for padded batches,
* curation flags are traced scalars (one compiled graph for all modes),
* ``mmtm_off`` average squeeze maps are passed functionally at apply time
  (the reference loads them into the module at construction,
  src/model.py:39-48 — the gin surface is honored by the eval entry point).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .fusion import FUSION_WIDTHS, fused_towers_forward
from .mmtm import MMTM, mmtm_config_kwargs
from .resnet import ResNet18Trunk
from .. import config as cfg

# ModelNet40 class names (reference: src/model.py:30-34).
MODELNET40_CLASSNAMES = [
    "airplane", "bathtub", "bed", "bench", "bookshelf", "bottle", "bowl", "car", "chair",
    "cone", "cup", "curtain", "desk", "door", "dresser", "flower_pot", "glass_box",
    "guitar", "keyboard", "lamp", "laptop", "mantel", "monitor", "night_stand",
    "person", "piano", "plant", "radio", "range_hood", "sink", "sofa", "stairs",
    "stool", "table", "tent", "toilet", "tv_stand", "vase", "wardrobe", "xbox",
]

# Default 2-modality names used for BDR parameter grouping
# (reference: configs/training.gin Bias_Mitigation_Strong.MMTMnames).
DEFAULT_MODALITY_NAMES = ("visual", "skeleton")


class MMTMMVCNN(nn.Module):
    """N-tower ResNet-18 + MMTM fusion model.

    ``num_towers`` is the number of modalities (views routed to separate
    towers); the reference's ``num_views`` gin binding maps here.
    """

    nclasses: int = 40
    num_towers: int = 2
    modality_names: Sequence[str] = DEFAULT_MODALITY_NAMES
    mmtm_ratio: float = 4.0
    SEonly: bool = False
    shareweight: bool = False
    bug_compat: bool = True
    use_pallas: bool = False
    saving_mmtm_scales: bool = False
    saving_mmtm_squeeze_array: bool = False
    remat: bool = False
    stem_s2d: bool = False  # space-to-depth conv1 compute path (resnet.StemConv)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        n = self.num_towers
        self.towers = [
            ResNet18Trunk(
                nclasses=self.nclasses,
                dtype=self.dtype,
                remat=self.remat,
                stem_s2d=self.stem_s2d,
                name=f"net_view_{i}",
            )
            for i in range(n)
        ]
        self.mmtms = {
            li: MMTM(
                dims=[w] * n,
                ratio=self.mmtm_ratio,
                modality_names=tuple(self.modality_names),
                SEonly=self.SEonly,
                shareweight=self.shareweight,
                bug_compat=self.bug_compat,
                use_pallas=self.use_pallas,
                dtype=self.dtype,
                name=f"mmtm{li}",
            )
            for li, w in FUSION_WIDTHS.items()
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
        """x: (B, num_towers, H, W, C) image stack.

        Returns (blend_logits, [per-view logits], scales, squeezed_mps)
        mirroring the reference forward (src/model.py:63-108).
        """
        n = self.num_towers
        x = x.astype(self.dtype)
        feats = [self.towers[i].stem(x[:, i], train, valid_mask) for i in range(n)]
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


def resolve_pretrained_path():
    """Resolve the trunk-weights source for ``MMTM_MVCNN.pretraining=True``.

    The reference downloads torchvision ImageNet weights
    (reference: src/model.py:53); this zero-egress rebuild takes a local
    torchvision resnet18 state_dict instead, from the
    ``MMTM_MVCNN.pretrained_weights_path`` gin binding or the
    ``GML_PRETRAINED_RESNET18`` environment variable.  Returns None when
    pretraining is off; raises when pretraining is requested with no
    weights supplied."""
    import os

    if not cfg.query("MMTM_MVCNN", "pretraining", False):
        return None
    path = cfg.query("MMTM_MVCNN", "pretrained_weights_path", None) or os.environ.get(
        "GML_PRETRAINED_RESNET18"
    )
    if not path:
        raise NotImplementedError(
            "MMTM_MVCNN.pretraining=True needs local torchvision resnet18 weights "
            "(this environment cannot download them): set the gin binding "
            "MMTM_MVCNN.pretrained_weights_path or the GML_PRETRAINED_RESNET18 env var"
        )
    if not os.path.exists(path):
        raise FileNotFoundError(f"pretrained trunk weights not found: {path}")
    return path


def apply_pretrained_trunks(state, path, num_towers):
    """Load a torchvision resnet18 state_dict and merge its trunk into every
    tower of a fresh TrainState (the reference builds each tower as
    ``models.resnet18(pretrained=True)`` then replaces ``fc``, so all towers
    start from the same ImageNet trunk with fresh heads,
    reference: src/model.py:53-56)."""
    import pickle

    import numpy as np

    from ..utils.torch_compat import merge_loaded_params, state_dict_to_pytrees

    try:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=False)
    except ImportError:
        with open(path, "rb") as f:
            sd = pickle.load(f)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    trunk_p, trunk_b = state_dict_to_pytrees(sd)
    # nclasses head stays freshly initialized (torchvision fc is 1000-way)
    trunk_p.pop("fc", None)

    new_p, new_b = dict(state.params), dict(state.batch_stats)
    for i in range(num_towers):
        tower = f"net_view_{i}"
        new_p[tower] = merge_loaded_params(dict(state.params[tower]), trunk_p)
        new_b[tower] = merge_loaded_params(dict(state.batch_stats[tower]), trunk_b)
    import jax

    as_np = lambda t: jax.tree_util.tree_map(np.asarray, t)
    return state.replace(params=as_np(new_p), batch_stats=as_np(new_b))


def build_model_from_config(dtype=None) -> MMTMMVCNN:
    """Construct the flagship model from the reference's ``MMTM_MVCNN`` gin
    surface (reference: src/model.py:15-27 + configs/*.gin)."""
    q = lambda p, d: cfg.query("MMTM_MVCNN", p, d)
    mk = mmtm_config_kwargs()
    resolve_pretrained_path()  # raises early if pretraining lacks weights
    num_towers = int(q("num_views", 2))
    names = cfg.query("Bias_Mitigation_Strong", "MMTMnames", None) or list(DEFAULT_MODALITY_NAMES)
    if len(names) != num_towers:
        names = [f"modal_{i}" for i in range(num_towers)]
        if num_towers == 2:
            names = list(DEFAULT_MODALITY_NAMES)
    dtype_name = q("compute_dtype", "float32") if dtype is None else dtype
    return MMTMMVCNN(
        nclasses=int(q("nclasses", 40)),
        num_towers=num_towers,
        modality_names=tuple(names),
        SEonly=mk["SEonly"],
        shareweight=mk["shareweight"],
        bug_compat=mk["bug_compat"],
        use_pallas=mk["use_pallas"],
        saving_mmtm_scales=bool(q("saving_mmtm_scales", False)),
        saving_mmtm_squeeze_array=bool(q("saving_mmtm_squeeze_array", False)),
        remat=bool(q("remat", False)),
        stem_s2d=bool(q("stem_s2d", False)),
        dtype=jnp.dtype(dtype_name) if isinstance(dtype_name, str) else dtype_name,
    )
