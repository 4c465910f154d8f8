from .nas import NAS
from .sam import SAM, FastSAM, SAMPredictor
from .sam2 import SAM2, SAM2VideoPredictor
from .yolo import YOLO, YOLOE, YOLOWorld

__all__ = [
    "YOLO",
    "YOLOE",
    "YOLOWorld",
    "SAM",
    "SAM2",
    "SAMPredictor",
    "SAM2VideoPredictor",
    "FastSAM",
    "NAS",
]
