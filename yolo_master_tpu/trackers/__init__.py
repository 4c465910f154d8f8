from .byte_tracker import BYTETracker, STrack
from .bot_sort import BOTSORT
from .oc_sort import OCSORT, DeepOCSORT, OCTrack

TRACKER_MAP = {
    "bytetrack": BYTETracker,
    "botsort": BOTSORT,
    "ocsort": OCSORT,
    "deepocsort": DeepOCSORT,
}

__all__ = ["BYTETracker", "BOTSORT", "OCSORT", "DeepOCSORT", "STrack", "OCTrack", "TRACKER_MAP"]
