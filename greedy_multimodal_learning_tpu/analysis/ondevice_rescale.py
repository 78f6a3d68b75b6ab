"""On-device rescale-weight reduction for recording passes.

The reference's two-pass conditional-utilization pipeline stores EVERY
per-sample squeeze map into ``history.pickle`` and reduces them on the host
(reference: src/balanced_mmtm.py:157-206).  That interchange format is the
compatibility contract and stays the default — but when the only consumer
is :func:`~.utilization.get_rescale_weights`, the whole payload collapses
to per-MMTM per-view *means over the training indices*: a few KB instead
of the multi-MB per-sample record (PERF.md measured 8.6 MB/pass, ~11 min
on a degraded dev link, vs ~KBs here).

:class:`RescaleMeanAccumulator` consumes the eval step's packed recording
buffer (engine/steps.py packs all squeeze arrays into one flat f32 buffer
per step) *before* it is ever fetched: a jitted masked row-sum accumulates
``sum over {samples in the selected index set}`` per (module, view) on
device; only the final (C,)-sized means cross the link.  The membership
mask is computed host-side from each batch's sample indices (B floats of
H2D per step — noise).

Equivalence with the pickle pipeline is pinned by
tests/test_ondevice_rescale.py (same run, both paths, allclose).
"""

from __future__ import annotations

import logging

import numpy as np

logger = logging.getLogger(__name__)

RESCALE_MEANS_FILENAME = "rescale_means.pkl"


class RescaleMeanAccumulator:
    """Masked on-device mean of recorded squeeze maps over an index set.

    Parameters
    ----------
    selected_indices:
        Dataset indices to average over (the original training run's
        ``train_indices`` — or ``val_indices`` — exactly as
        ``get_rescale_weights`` would select them).  Must be unique: the
        host pipeline's ``mean(0)`` weights every selected row once.
    record_pack_spec:
        The eval step's shared pack-layout list (filled at first trace;
        this accumulator reads it lazily at first consume, by which point
        the dispatch that produced the packed buffer has traced it).
    """

    def __init__(self, selected_indices, record_pack_spec):
        from collections import Counter

        self.selected = np.asarray(selected_indices)
        # Multiset weighting: the host pipeline's ``maps[selected].mean(0)``
        # counts a duplicated selected index once PER OCCURRENCE (multi-host
        # training histories can contain borrowed top-up duplicates,
        # parallel/multihost.py), so the member weight is the multiplicity,
        # not 0/1.
        self._weight_of = Counter(int(i) for i in self.selected)
        self.spec = record_pack_spec
        self.sums = None  # list of (C,) device arrays aligned to squeeze spec entries
        self.count = None  # device scalar: number of member samples consumed
        self._acc_fns = {}  # leading-shape -> jitted accumulate
        self._squeeze_entries = None  # [(spec_offset, mi, vi, shape)]

    # -- spec handling ------------------------------------------------------

    def _entries(self):
        """Squeeze-map entries of the (now-filled) pack spec, with their
        flat-buffer offsets."""
        if self._squeeze_entries is None:
            assert self.spec, "pack spec empty: consume() before first dispatch?"
            entries = []
            offset = 0
            for key, mi, vi, shape in self.spec:
                n = int(np.prod(shape))
                if key == "squeezedmaps_array_list":
                    entries.append((offset, mi, vi, tuple(shape)))
                offset += n
            assert entries, "recording pass produced no squeeze maps"
            self._squeeze_entries = entries
        return self._squeeze_entries

    # -- accumulation -------------------------------------------------------

    def member_mask(self, indices_trimmed, size, batch_rows):
        """(batch_rows,) f32 row weights: the selected-set multiplicity of
        each real row's sample index (usually 1), 0.0 for non-members and
        padding."""
        row = np.zeros((batch_rows,), np.float32)
        for j, idx in enumerate(np.asarray(indices_trimmed)[:size]):
            row[j] = self._weight_of.get(int(idx), 0.0)
        return row

    def consume(self, packed, member):
        """Fold one step's packed buffer into the running sums.

        ``packed``: (flat,) for a per-step program or (K, flat) for a scan
        group; ``member``: matching (B,) or (K, B) host mask."""
        import jax
        import jax.numpy as jnp

        entries = self._entries()
        member = np.atleast_2d(np.asarray(member, np.float32))  # (K, B)
        packed2 = packed if packed.ndim == 2 else packed[None]  # (K, flat)
        key = packed2.shape
        if self.sums is None:
            self.sums = [jnp.zeros(shape[1:], jnp.float32) for _, _, _, shape in entries]
            self.count = jnp.zeros((), jnp.float32)
        if key not in self._acc_fns:
            spec_snapshot = tuple(entries)

            def acc(packed2, member, sums, count):
                new_sums = []
                for (offset, _, _, shape), s in zip(spec_snapshot, sums):
                    n = int(np.prod(shape))
                    seg = packed2[:, offset : offset + n].reshape((-1,) + shape)
                    # (K, B, C...) weighted-summed over both batch axes
                    w = member.reshape(member.shape + (1,) * (len(shape) - 1))
                    new_sums.append(s + jnp.sum(seg * w, axis=(0, 1)))
                return new_sums, count + jnp.sum(member)

            self._acc_fns[key] = jax.jit(acc)
        self.sums, self.count = self._acc_fns[key](packed2, member, self.sums, self.count)

    # -- results ------------------------------------------------------------

    def means(self):
        """Fetch the per-(module, view) means — the ONLY D2H of the payload.

        Returns {module_index: {view_index: (C,) np.float32}} plus the
        member count, in the same (mi, vi) identity the pickle pipeline's
        ``get_mmtm_outputs`` uses."""
        import jax

        assert self.sums is not None, "nothing consumed"
        fetched = jax.device_get({"sums": self.sums, "count": self.count})
        count = float(fetched["count"])
        if count != len(self.selected):
            logger.warning(
                "on-device rescale reduction consumed %d member samples but "
                "%d were selected — the recording pass did not cover the "
                "full selected index set",
                int(count), len(self.selected),
            )
        out = {}
        for (_, mi, vi, _), s in zip(self._entries(), fetched["sums"]):
            out.setdefault(mi, {})[vi] = np.asarray(s, np.float32) / max(count, 1.0)
        return out, int(count)
