"""Environment compatibility patches for running the UNMODIFIED reference
implementation on this machine (CPU-only torch 2.13, numpy 2.0).  These
patch the *environment the reference runs in*, never the reference's own
algorithm:

* ``np.Inf`` — removed in numpy 2.0; the reference's ModelCheckpoint uses
  it (reference: src/callbacks.py:404-420).
* ``torch.load`` — torch >= 2.6 defaults weights_only=True, which rejects
  the pickled numpy arrays inside the reference's torch-serialized ``.npy``
  view stacks (quirk #14, reference: src/dataset.py:121) and its checkpoint
  dicts (src/training_loop.py:80).
* ``torch.Tensor.to("cuda:N")`` — the reference pins its MMTM running-
  average buffers to cuda at module init (reference: src/balanced_mmtm.py:
  30-31), which raises on a CUDA-less build; the patch drops the device
  move (buffers stay on CPU, where the whole run executes).
* ``ReduceLROnPlateau(verbose=...)`` — the kwarg was removed from torch's
  scheduler; the reference passes verbose=True (src/callbacks.py:341-345).
"""

import functools
import inspect


def apply_torch_compat():
    import numpy as np
    import torch

    if not hasattr(np, "Inf"):
        np.Inf = np.inf

    if not getattr(torch.load, "_parity_patched", False):
        _load = torch.load

        @functools.wraps(_load)
        def load(*a, **kw):
            kw.setdefault("weights_only", False)
            return _load(*a, **kw)

        load._parity_patched = True
        torch.load = load

    if not getattr(torch.Tensor.to, "_parity_patched", False):
        _to = torch.Tensor.to

        def to(self, *a, **kw):
            if (
                a
                and isinstance(a[0], (str, torch.device))
                and "cuda" in str(a[0])
                and not torch.cuda.is_available()
            ):
                a = a[1:]  # drop the device -> tensor stays on CPU
                if not a and not kw:
                    return self
            return _to(self, *a, **kw)

        to._parity_patched = True
        torch.Tensor.to = to

    RLP = torch.optim.lr_scheduler.ReduceLROnPlateau
    if "verbose" not in inspect.signature(RLP.__init__).parameters:

        class _ReduceLROnPlateau(RLP):
            def __init__(self, *a, verbose=False, **kw):
                super().__init__(*a, **kw)

        torch.optim.lr_scheduler.ReduceLROnPlateau = _ReduceLROnPlateau
