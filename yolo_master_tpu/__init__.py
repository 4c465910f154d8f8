"""yolo_master_tpu — TPU-native (JAX/XLA/Pallas) rebuild of YOLO-Master.

Same capabilities as Tencent/YOLO-Master (reference mounted at /root/reference),
re-designed TPU-first: NHWC feature maps, static shapes everywhere, functional
parameter pytrees, routing as masked/capacity-bounded static dispatch, NMS and
box decode fused on device, scaling via jax.sharding meshes.

Top-level surface mirrors the reference package root
(/root/reference/ultralytics/__init__.py:19-44): model facades are
lazy-imported on first attribute access so `import yolo_master_tpu` stays
cheap (no cv2/flax model code pulled in until a facade is touched).
"""

import importlib
from typing import TYPE_CHECKING

__version__ = "0.1.0"

# reference MODELS tuple (ultralytics/__init__.py:19) + our SAM2 addition
_MODELS = ("YOLO", "YOLOWorld", "YOLOE", "NAS", "SAM", "SAM2", "FastSAM", "RTDETR")
_LAZY = {
    **{name: ("yolo_master_tpu.models", name) for name in _MODELS},
    "DetectionModel": ("yolo_master_tpu.nn.tasks", "DetectionModel"),
    "ClassificationModel": ("yolo_master_tpu.nn.tasks", "ClassificationModel"),
    "checks": ("yolo_master_tpu.utils.checks", None),  # module itself
}

__all__ = ["__version__", "settings", *sorted(_LAZY)]

if TYPE_CHECKING:  # hints for type checkers / IDEs
    from .models import YOLO, YOLOWorld, YOLOE, NAS, SAM, SAM2, FastSAM, RTDETR  # noqa: F401
    from .nn.tasks import ClassificationModel, DetectionModel  # noqa: F401


def __getattr__(name: str):
    """Lazy-import facades on first access (reference __init__.py:35-39)."""
    if name == "settings":  # reference SETTINGS singleton (utils/__init__.py:1353)
        from .utils.settings import get_settings

        return get_settings()
    if name in _LAZY:
        mod_name, attr = _LAZY[name]
        mod = importlib.import_module(mod_name)
        return getattr(mod, attr) if attr else mod
    raise AttributeError(f"module {__name__} has no attribute {name}")


def __dir__():
    return sorted(set(globals()) | set(_LAZY) | {"settings"})
