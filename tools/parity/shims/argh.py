"""`argh` shim: the reference uses exactly one entry point,
``argh.dispatch_command(main)`` with ``main(save_path, config, bindings="")``
(reference: src/utils.py:57-68).  Positional argv dispatch is all that's
needed."""

import sys


def dispatch_command(fn):
    fn(*sys.argv[1:])
