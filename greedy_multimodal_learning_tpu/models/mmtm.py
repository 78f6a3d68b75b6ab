"""MMTM squeeze-excitation cross-modal fusion, N-modality, TPU-first.

Behavioral spec from the reference's ``MMTM_mitigate``
(reference: src/balanced_mmtm.py:16-154), generalized from 2 hardcoded
modalities to N, with every mode expressed as *arithmetic selects on traced
flags* so a single jitted graph serves normal / curation / recording modes:

1. squeeze: per-modality spatial mean (reference :94-97),
2. joint excitation: relu(fc_squeeze(concat(squeezes))) (reference :99-101),
3. per-modality gates: sigmoid(fc_<name>(excitation)) (reference :107-111),
4. running-average gate buffers updated every forward — including eval
   passes, there is deliberately no train-mode gate (reference :113-116,
   quirk catalog #6) — with a step counter,
5. curation mode: the cared-for modality's gate is replaced by the
   *post-update* running average (detached); others keep live gates
   (reference :135-152),
6. ``turnoff_cross_modal_flow``: each modality's view of every *other*
   modality's squeeze is replaced by a dataset-average squeeze map
   (reference :72-91) — the conditional-utilization-rate eval mode.

``bug_compat`` replicates the reference's copy-paste bug where the skeleton
running average is updated from the *visual* gate (reference
src/balanced_mmtm.py:113-114); default True for checkpoint-level parity,
honored only for the 2-modality case.

The gate computation can be lowered to a fused Pallas kernel
(ops/mmtm_pallas.py) via ``use_pallas``.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import TorchLinear
from .. import config as cfg


def mmtm_config_kwargs():
    """Read the reference's ``MMTM_mitigate`` gin surface
    (reference: src/balanced_mmtm.py:15-28) plus rebuild-specific knobs."""
    return dict(
        SEonly=bool(cfg.query("MMTM_mitigate", "SEonly", False)),
        shareweight=bool(cfg.query("MMTM_mitigate", "shareweight", False)),
        bug_compat=bool(cfg.query("MMTM_mitigate", "bug_compat", True)),
        use_pallas=bool(cfg.query("MMTM_mitigate", "use_pallas", False)),
    )


class MMTM(nn.Module):
    """N-modality MMTM fusion with running-average gate state.

    Args mirror the reference's gin surface (dim_visual/dim_skeleton/ratio,
    SEonly, shareweight) while generalizing to ``dims`` for N modalities.
    """

    dims: Sequence[int]
    ratio: float = 4.0
    modality_names: Sequence[str] = ("visual", "skeleton")
    SEonly: bool = False
    shareweight: bool = False
    bug_compat: bool = True
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert len(self.dims) == len(self.modality_names)
        dim = sum(self.dims)
        dim_out = int(2 * dim / self.ratio)
        self.dim_out = dim_out
        if self.SEonly:
            self.fc_squeeze_per_modality = [
                TorchLinear(dim_out, dtype=self.dtype, name=f"fc_squeeze_{name}")
                for name in self.modality_names
            ]
        else:
            self.fc_squeeze = TorchLinear(dim_out, dtype=self.dtype, name="fc_squeeze")

        if self.shareweight:
            assert len(set(self.dims)) == 1, "shareweight requires equal dims"
            self.fc_excite = TorchLinear(self.dims[0], dtype=self.dtype, name="fc_excite")
        else:
            self.fc_excites = [
                TorchLinear(d, dtype=self.dtype, name=f"fc_{name}")
                for d, name in zip(self.dims, self.modality_names)
            ]

        # Running-average gate buffers + step counter live in the 'mmtm'
        # collection (reference: src/balanced_mmtm.py:30-32).
        self.running_avgs = [
            self.variable("mmtm", f"running_avg_{name}", lambda d=d: jnp.zeros((d,), jnp.float32))
            for name, d in zip(self.modality_names, self.dims)
        ]
        self.step_var = self.variable("mmtm", "step", lambda: jnp.zeros((), jnp.float32))

    def _excite(self, i: int, excitation):
        if self.shareweight:
            return self.fc_excite(excitation)
        return self.fc_excites[i](excitation)

    def __call__(
        self,
        features: List[jnp.ndarray],
        *,
        curation_mode=None,
        caring_modality=None,
        turnoff_cross_modal_flow: bool = False,
        average_squeezemaps: Optional[Sequence[jnp.ndarray]] = None,
        valid_mask: Optional[jnp.ndarray] = None,
        return_scale: bool = False,
        return_squeezed_mps: bool = False,
    ):
        """Fuse ``features`` (list of (B, ..., C_i) arrays, NHWC-style).

        ``curation_mode`` (traced bool) / ``caring_modality`` (traced int32)
        select curation arithmetic without retracing.  Returns
        (scaled_features, scales, squeezes) where scales/squeezes are None
        unless requested (reference returns the same quadruple,
        src/balanced_mmtm.py:118-154).
        """
        n = len(features)
        batch = features[0].shape[0]
        if curation_mode is None:
            curation_mode = jnp.asarray(False)
        if caring_modality is None:
            caring_modality = jnp.asarray(0, jnp.int32)

        if valid_mask is None:
            mask = jnp.ones((batch,), jnp.float32)
        else:
            mask = valid_mask.astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(mask), 1.0)

        # --- squeeze: per-modality global spatial mean (f32 accumulate) ---
        squeezes = [
            jnp.mean(f.astype(jnp.float32).reshape(batch, -1, f.shape[-1]), axis=1)
            for f in features
        ]

        # --- excitation + gates ---
        pre_scaled = None  # fused-kernel path provides live-gate-scaled features
        if self.SEonly:
            gates = []
            for i in range(n):
                excitation = self.fc_squeeze_per_modality[i](squeezes[i].astype(self.dtype))
                gates.append(jax.nn.sigmoid(self._excite(i, nn.relu(excitation)).astype(jnp.float32)))
        elif turnoff_cross_modal_flow:
            # Each modality sees its own live squeeze and dataset-average
            # squeezes for every other modality (reference :72-91).
            assert average_squeezemaps is not None
            gates = []
            for i in range(n):
                parts = [
                    squeezes[j]
                    if j == i
                    else jnp.broadcast_to(
                        jnp.asarray(average_squeezemaps[j], jnp.float32)[None, :], (batch, self.dims[j])
                    )
                    for j in range(n)
                ]
                mixed = jnp.concatenate(parts, axis=1)
                excitation = nn.relu(self.fc_squeeze(mixed.astype(self.dtype)))
                gates.append(jax.nn.sigmoid(self._excite(i, excitation).astype(jnp.float32)))
        else:
            use_kernel = (
                self.use_pallas
                and n == 2
                and len(set(self.dims)) == 1
                and not self.shareweight
                and features[0].ndim >= 3
                # kernel indexes both modalities by f0's (B, S, C): unequal
                # spatial shapes must take the general JAX path
                and features[0].shape == features[1].shape
                # TPU kernel; CPU runs it in interpreter mode (tests).  Any
                # other backend (e.g. GPU) falls back to the JAX path
                # instead of failing to lower a pltpu-targeted kernel.
                and jax.default_backend() in ("tpu", "cpu")
                and not self.is_initializing()
            )
            if use_kernel:
                from ..ops.mmtm_pallas import fused_mmtm_gating

                C = self.dims[0]
                f0r = features[0].reshape(batch, -1, C)
                f1r = features[1].reshape(batch, -1, C)
                p_sq = self.fc_squeeze.variables["params"]
                p0 = self.fc_excites[0].variables["params"]
                p1 = self.fc_excites[1].variables["params"]
                interpret = jax.default_backend() == "cpu"
                # Weights cast to the compute dtype so the kernel's matmuls
                # run at the same precision as TorchLinear's (layers.py:61)
                # — use_pallas stays a pure performance toggle under bf16.
                cast = lambda a: a.astype(self.dtype)
                out0p, out1p, s0, s1, g0, g1 = fused_mmtm_gating(
                    f0r,
                    f1r,
                    cast(p_sq["kernel"]),
                    cast(p_sq["bias"]),
                    cast(p0["kernel"]),
                    cast(p0["bias"]),
                    cast(p1["kernel"]),
                    cast(p1["bias"]),
                    8,
                    interpret,
                )
                squeezes = [s0, s1]
                gates = [g0, g1]
                pre_scaled = [out0p.reshape(features[0].shape), out1p.reshape(features[1].shape)]
            else:
                joint = jnp.concatenate(squeezes, axis=1)
                excitation = nn.relu(self.fc_squeeze(joint.astype(self.dtype)))
                gates = [
                    jax.nn.sigmoid(self._excite(i, excitation).astype(jnp.float32)) for i in range(n)
                ]

        # --- running-average gate buffers (updated every forward; quirk #6) ---
        running = self.running_avgs
        step = self.step_var

        gate_means = [jnp.sum(g * mask[:, None], axis=0) / denom for g in gates]
        new_running = []
        for i in range(n):
            src = gate_means[0] if (self.bug_compat and n == 2) else gate_means[i]
            new_avg = jax.lax.stop_gradient((src + running[i].value * step.value) / (step.value + 1.0))
            new_running.append(new_avg)
        if not self.is_initializing():
            for i in range(n):
                running[i].value = new_running[i]
            step.value = step.value + 1.0

        scales = [g for g in gates] if return_scale else None
        squeezed_mps = [s for s in squeezes] if return_squeezed_mps else None

        # --- curation select: cared modality's gate <- post-update running avg ---
        outs = []
        for i in range(n):
            use_avg = jnp.logical_and(curation_mode, caring_modality == i)
            bshape = (1,) * (features[i].ndim - 1) + (self.dims[i],)
            if pre_scaled is not None:
                # Kernel path already produced f*live_gate; the (rare)
                # curation branch rescales from f at runtime via cond.
                f_i = features[i]
                avg_i = jax.lax.stop_gradient(new_running[i]).reshape(bshape).astype(f_i.dtype)
                outs.append(
                    jax.lax.cond(
                        use_avg,
                        lambda f=f_i, a=avg_i: f * a,
                        lambda o=pre_scaled[i]: o,
                    )
                )
            else:
                avg_gate = jnp.broadcast_to(new_running[i][None, :], gates[i].shape)
                gate = jnp.where(use_avg, jax.lax.stop_gradient(avg_gate), gates[i])
                gshape = (batch,) + (1,) * (features[i].ndim - 2) + (self.dims[i],)
                outs.append(features[i] * gate.reshape(gshape).astype(features[i].dtype))

        return outs, scales, squeezed_mps
