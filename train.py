#!/usr/bin/env python3
"""Trainer entry point — CLI surface preserved verbatim from the reference
(reference: train.py, README.md:14-18):

    python3 train.py SAVE_PATH CONFIG.gin [BINDINGS]

Config files are '#'-separable mixins; bindings are '#'-separated
``Name.param=value`` lines.

The configurable function itself lives in the package
(greedy_multimodal_learning_tpu/entries.py) so it can also be driven
in-process via run_api.run_entry; this script only adds the CLI dispatch
and multi-host initialization.
"""

from greedy_multimodal_learning_tpu.entries import train  # noqa: F401  (re-export)
from greedy_multimodal_learning_tpu.parallel import maybe_initialize_distributed
from greedy_multimodal_learning_tpu.utils import gin_wrap

maybe_initialize_distributed()


if __name__ == "__main__":
    gin_wrap(train)
