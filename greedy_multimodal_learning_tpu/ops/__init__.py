from .mmtm_pallas import fused_mmtm_gating
