"""Centralized solutions configuration (reference: ultralytics/solutions/config.py).

One typed dataclass shared by every solutions app; ``update()`` rejects
unknown keys with a did-you-mean hint, mirroring the reference contract. Apps
keep their explicit constructor kwargs (each app documents what it uses) —
``SolutionConfig.for_app(cls)`` extracts just the subset an app's __init__
accepts, so a single config can drive a whole pipeline of apps.
"""

from __future__ import annotations

import difflib
import inspect
from dataclasses import asdict, dataclass, field, fields
from typing import Any, List, Optional, Tuple


@dataclass
class SolutionConfig:
    # source / model
    source: Optional[str] = None
    model: Optional[str] = None
    classes: Optional[List[int]] = None
    # display
    show: bool = False
    show_conf: bool = True
    show_labels: bool = True
    show_boxes: bool = True
    line_width: int = 2
    verbose: bool = False
    # region-based apps (counter / queue / trackzone)
    region: Optional[List[Tuple[int, int]]] = None
    show_in: bool = True
    show_out: bool = True
    # heatmap
    colormap: Optional[int] = None
    # workouts (AIGym)
    up_angle: float = 145.0
    down_angle: float = 90.0
    kpts: List[int] = field(default_factory=lambda: [6, 8, 10])
    # analytics
    analytics_type: str = "line"
    figsize: Tuple[float, float] = (12.8, 7.2)
    # blur / crop
    blur_ratio: float = 0.5
    crop_dir: str = "cropped-detections"
    # vision-eye / distance / speed
    vision_point: Tuple[int, int] = (20, 20)
    fps: float = 30.0
    max_hist: int = 5
    meter_per_pixel: float = 0.05
    max_speed: int = 120
    # parking
    json_file: Optional[str] = None
    # alarms
    records: int = 5
    # inference knobs
    iou: float = 0.7
    conf: float = 0.25
    max_det: int = 300
    tracker: str = "bytetrack"
    # similarity search
    data: str = "images"

    def update(self, **kwargs: Any) -> "SolutionConfig":
        """Override fields; unknown keys raise with a did-you-mean hint
        (reference config.py update)."""
        valid = {f.name for f in fields(self)}
        for k, v in kwargs.items():
            if k not in valid:
                hint = difflib.get_close_matches(k, valid, n=1)
                raise ValueError(
                    f"unknown solutions config key '{k}'"
                    + (f" — did you mean '{hint[0]}'?" if hint else "")
                )
            setattr(self, k, v)
        return self

    def for_app(self, app_cls) -> dict:
        """The subset of this config accepted by ``app_cls.__init__``."""
        sig = inspect.signature(app_cls.__init__)
        names = {p for p in sig.parameters if p != "self"}
        return {k: v for k, v in asdict(self).items() if k in names}
