"""Data layer: COCO captioning bundle loader, batching, text decoding."""

from .coco import (
    CocoData,
    decode_captions,
    get_coco_batch,
    get_coco_minibatches,
    get_coco_validation_data,
    load_data,
)
from .synthetic import make_synthetic_coco
from .device import DeviceCocoTables

__all__ = [
    "CocoData",
    "load_data",
    "decode_captions",
    "get_coco_batch",
    "get_coco_minibatches",
    "get_coco_validation_data",
    "make_synthetic_coco",
    "DeviceCocoTables",
]
