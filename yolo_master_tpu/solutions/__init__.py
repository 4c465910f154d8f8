from .counter import ObjectCounter, RegionCounter
from .heatmap import Heatmap
from .speed import SpeedEstimator
from .distance import DistanceCalculator
from .queue import QueueManager

__all__ = ["ObjectCounter", "RegionCounter", "Heatmap", "SpeedEstimator", "DistanceCalculator", "QueueManager"]
