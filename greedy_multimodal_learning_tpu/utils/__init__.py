from .logging_utils import (
    Fork,
    configure_logger,
    gin_wrap,
    run_with_redirection,
)
from .pytree import tree_to_numpy, tree_size_bytes
