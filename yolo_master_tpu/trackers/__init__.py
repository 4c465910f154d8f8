from .byte_tracker import BYTETracker, STrack
from .bot_sort import BOTSORT

TRACKER_MAP = {"bytetrack": BYTETracker, "botsort": BOTSORT}

__all__ = ["BYTETracker", "BOTSORT", "STrack", "TRACKER_MAP"]
