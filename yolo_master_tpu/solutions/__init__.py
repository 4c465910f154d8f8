from .config import SolutionConfig
from .counter import ObjectCounter, RegionCounter
from .heatmap import Heatmap
from .speed import SpeedEstimator
from .distance import DistanceCalculator
from .queue import QueueManager
from .apps import (
    AIGym,
    Analytics,
    InstanceSegmentationOverlay,
    ObjectBlurrer,
    ObjectCropper,
    ParkingManagement,
    SecurityAlarm,
    TrackZone,
    VisionEye,
)
from .similarity import SearchApp, VisualAISearch, signature_embed
from .inference import Inference

__all__ = [
    "SolutionConfig",
    "ObjectCounter", "RegionCounter", "Heatmap", "SpeedEstimator", "DistanceCalculator",
    "QueueManager", "ParkingManagement", "Analytics", "AIGym", "TrackZone",
    "ObjectBlurrer", "ObjectCropper", "VisionEye", "SecurityAlarm", "InstanceSegmentationOverlay",
    "VisualAISearch", "SearchApp", "signature_embed", "Inference",
]
