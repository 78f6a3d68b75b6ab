"""Multi-host (multi-slice) support.

Single-slice scaling rides ICI via the ('data','model') mesh
(parallel/mesh.py).  Across slices/hosts, JAX's distributed runtime carries
the coordination over DCN; each host feeds its process-local slice of the
global batch.

Conventions (all optional — absent env vars mean single-process):

* ``GML_COORDINATOR_ADDRESS`` / ``GML_NUM_PROCESSES`` / ``GML_PROCESS_ID``
  (or the standard JAX auto-detected cluster envs) trigger
  ``jax.distributed.initialize`` at entry-point start,
* :func:`global_batch_from_local` assembles a globally-sharded batch from
  each host's local shard via ``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

import logging
import os

import jax

logger = logging.getLogger(__name__)


def maybe_initialize_distributed():
    """Initialize jax.distributed when a coordinator is configured.

    Returns True if a multi-process runtime was initialized.
    """
    addr = os.environ.get("GML_COORDINATOR_ADDRESS")
    if not addr:
        return False
    num = int(os.environ.get("GML_NUM_PROCESSES", "1"))
    pid = int(os.environ.get("GML_PROCESS_ID", "0"))
    jax.distributed.initialize(coordinator_address=addr, num_processes=num, process_id=pid)
    logger.info("jax.distributed initialized: process %d/%d @ %s", pid, num, addr)
    return True


def process_local_indices(indices):
    """Per-process slice of a dataset index list for multi-host input
    pipelines (each host feeds its local rows of the global batch).

    Every process gets exactly ``ceil(len/n)`` indices so all hosts dispatch
    the same number of steps (SPMD programs deadlock on mismatched step
    counts).  When ``len`` is not divisible by ``n``, short slices are
    topped up by borrowing from the front of the full list — every sample
    is covered, at the cost of up to n-1 duplicates per epoch (documented
    skew ≤ (n-1)/len on size-weighted metrics), rather than silently
    dropping tail samples.  Identity in single-process runs."""
    n = jax.process_count()
    indices = list(indices)
    if n <= 1 or not indices:
        return indices
    pid = jax.process_index()
    per = -(-len(indices) // n)  # ceil
    mine = indices[pid::n]
    fill = 0
    while len(mine) < per:
        mine.append(indices[fill % len(indices)])
        fill += 1
    return mine


def _place_local(value, mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    if hasattr(value, "ndim") and value.ndim >= 1:
        return jax.make_array_from_process_local_data(NamedSharding(mesh, P("data")), value)
    return value


def global_batch_from_local(local_batch, mesh):
    """Each host contributes its local rows of the global batch; array
    leaves become globally-sharded jax.Arrays on the mesh's data axis.

    Accepts a batch dict or a single array leaf (the prefetch stage in
    data/pipeline.py applies the placement per leaf)."""
    if isinstance(local_batch, dict):
        return {key: _place_local(value, mesh) for key, value in local_batch.items()}
    return _place_local(local_batch, mesh)
