"""Shared trunk+MMTM fusion forward used by both model families.

MMTM_MVCNN (2D multiview, reference: src/model.py:63-108) and MMTM_3DCNN
(3-modality clips) run the identical topology: per-tower stem+layer1, then
for layer groups 2..4 a tower layer followed by MMTM fusion, then
avgpool→fc heads and logit blending.  One implementation serves both so
fixes to the fusion contract (curation threading, the 4-slot
``average_squeezemaps`` indexing, masked statistics) cannot drift between
the families.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

# Fusion sits after layer groups 2/3/4 at these trunk widths
# (reference: src/model.py:58-60); 3D trunks scale them by width_multiplier.
FUSION_WIDTHS = {2: 128, 3: 256, 4: 512}


def fused_towers_forward(
    towers,
    mmtms,
    feats,
    *,
    curation_mode,
    caring_modality,
    train: bool,
    valid_mask,
    mmtm_off: bool,
    average_squeezemaps: Optional[Sequence],
    saving_scales: bool,
    saving_squeezes: bool,
):
    """Run layer groups 2..4 + fusion + heads over per-tower ``feats``
    (the outputs of stem+layer1).

    ``average_squeezemaps`` follows the analysis pipeline's 4-slot
    contract: index 0 unused (no MMTM before layer 2), indices 1..3 map to
    mmtm2..mmtm4 (analysis/utilization.py::get_rescale_weights).

    Returns (blend_logits, [per-tower logits], scales, squeezed_mps).
    """
    n = len(towers)
    scales = []
    squeezed_mps = []
    for li in (2, 3, 4):
        feats = [towers[i].layer(li, feats[i], train, valid_mask) for i in range(n)]
        feats, scale, squeezed = mmtms[li](
            feats,
            curation_mode=curation_mode,
            caring_modality=caring_modality,
            turnoff_cross_modal_flow=mmtm_off,
            average_squeezemaps=average_squeezemaps[li - 1] if mmtm_off else None,
            valid_mask=valid_mask,
            return_scale=saving_scales,
            return_squeezed_mps=saving_squeezes,
        )
        scales.append(scale)
        squeezed_mps.append(squeezed)

    logits = [towers[i].head(feats[i]).astype(jnp.float32) for i in range(n)]
    blend = sum(logits) / float(n)
    return blend, logits, scales, squeezed_mps
