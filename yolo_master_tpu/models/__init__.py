from .nas import NAS
from .sam import SAM, FastSAM, SAMPredictor
from .sam2 import SAM2, SAM2VideoPredictor
from .yolo import RTDETR, YOLO, YOLOE, YOLOWorld

__all__ = [
    "YOLO",
    "RTDETR",
    "YOLOE",
    "YOLOWorld",
    "SAM",
    "SAM2",
    "SAMPredictor",
    "SAM2VideoPredictor",
    "FastSAM",
    "NAS",
]
