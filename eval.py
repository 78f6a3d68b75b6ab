#!/usr/bin/env python3
"""Evaluation entry point — CLI surface preserved verbatim from the
reference (reference: eval.py, README.md:20-23):

    python3 eval.py SAVE_PATH configs/recording.gin   # squeeze-map recording
    python3 eval.py SAVE_PATH configs/eval.gin        # mmtm-off utilization eval

The configurable function itself lives in the package
(greedy_multimodal_learning_tpu/entries.py) so it can also be driven
in-process via run_api.run_entry; this script only adds the CLI dispatch.
"""

from greedy_multimodal_learning_tpu.entries import eval_  # noqa: F401  (re-export)
from greedy_multimodal_learning_tpu.utils import gin_wrap

if __name__ == "__main__":
    gin_wrap(eval_)
