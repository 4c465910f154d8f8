from .letterbox import letterbox

__all__ = ["letterbox"]
