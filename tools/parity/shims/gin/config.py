"""gin.config submodule shim: the reference imports ``_CONFIG`` (the live
binding store, passed into callbacks via set_config) and
``_OPERATIVE_CONFIG`` (only ever stored, never read back)."""

from greedy_multimodal_learning_tpu.config import CONFIG as _CONFIG  # noqa: F401

_OPERATIVE_CONFIG: dict = {}
