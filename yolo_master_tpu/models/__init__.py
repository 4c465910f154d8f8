from .yolo import YOLO, YOLOE, YOLOWorld

__all__ = ["YOLO", "YOLOE", "YOLOWorld"]
