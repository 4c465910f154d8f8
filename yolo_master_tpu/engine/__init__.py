from .results import Boxes, Results

__all__ = ["Boxes", "Results"]
