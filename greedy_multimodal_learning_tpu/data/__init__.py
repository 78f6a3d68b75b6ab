from .modelnet import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    MultiviewModelNet,
    get_mvdcndata,
    load_view_stack,
    reference_val_split,
)
from .pipeline import BatchPipeline, DeviceCachePipeline, wrap_device_cache
from .transforms import preprocess
