"""`gin` compatibility shim backed by the rebuild's from-scratch config
engine (greedy_multimodal_learning_tpu/config.py), which parses the
reference's gin files unchanged.

Purpose: run the UNMODIFIED reference implementation
(/root/reference, copied out-of-tree) in this environment, where the real
gin-config package is not installed.  The reference uses exactly:

* ``@gin.configurable`` on functions and classes
  (reference: train.py:43, src/model.py:15, src/callbacks.py:172...),
* ``gin.parse_config_files_and_bindings(files, bindings)``
  (reference: src/utils.py:61),
* ``from gin.config import _CONFIG`` / ``_OPERATIVE_CONFIG`` (threaded into
  callbacks via set_config; never introspected beyond being a dict).

This shim maps each onto the rebuild's engine so binding semantics
(apply-at-call-time, reference gin syntax) are identical to what the
rebuild itself uses — the fairest possible common ground for the parity
measurement.
"""

from greedy_multimodal_learning_tpu import config as _cfg

from . import config  # noqa: F401  (gin.config submodule)

configurable = _cfg.configurable
REQUIRED = _cfg.REQUIRED


def parse_config_files_and_bindings(config_files, bindings):
    _cfg.parse_config_files_and_bindings(config_files, bindings)


def operative_config_str():
    return _cfg.operative_config_str()
