from .byte_tracker import BYTETracker, STrack
from .bot_sort import BOTSORT
from .oc_sort import OCSORT, DeepOCSORT, OCTrack
from .fast_tracker import FASTTracker, FastSTrack
from .track_tracker import TRACKTRACK, TTSTrack

TRACKER_MAP = {
    "bytetrack": BYTETracker,
    "botsort": BOTSORT,
    "ocsort": OCSORT,
    "deepocsort": DeepOCSORT,
    "fasttrack": FASTTracker,
    "tracktrack": TRACKTRACK,
}

__all__ = [
    "BYTETracker", "BOTSORT", "OCSORT", "DeepOCSORT", "FASTTracker", "TRACKTRACK",
    "STrack", "OCTrack", "FastSTrack", "TTSTrack", "TRACKER_MAP",
]
