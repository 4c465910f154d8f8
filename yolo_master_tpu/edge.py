"""Edge deployment unified API: profile-aware one-command export + latency
benchmark (reference: ultralytics/edge/__init__.py:22-177 —
``EdgeDeployProfile`` scenarios, ``deploy_for_edge`` multi-format export,
``benchmark_edge_model`` latency stats).

TPU recast: exports run through engine/exporter's writer registry (so a
format either produces a real artifact or refuses honestly), every format is
preflighted against the capability matrix first (utils/export_preflight.py),
and the benchmark drives the exported artifact through AutoBackend's unified
forward + jitted NMS — the same path serving uses.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Union

import numpy as np

from .utils import LOGGER


@dataclass
class EdgeDeployProfile:
    """Pre-configured deployment scenario (reference edge/__init__.py:22)."""

    name: str
    imgsz: int = 640
    int8: bool = False
    nms: bool = True
    conf: float = 0.25
    iou: float = 0.45
    batch: int = 1
    max_det: int = 300
    metadata: Dict[str, str] = field(default_factory=dict)


BUILTIN_PROFILES: Dict[str, EdgeDeployProfile] = {
    "default": EdgeDeployProfile(name="default"),
    "visdrone": EdgeDeployProfile(
        name="visdrone", imgsz=960, conf=0.20, iou=0.55,
        metadata={"scenario": "drone aerial detection"},
    ),
    "sku110k": EdgeDeployProfile(
        name="sku110k", imgsz=1280, conf=0.25, iou=0.60,
        metadata={"scenario": "dense retail shelf detection"},
    ),
    "rpi": EdgeDeployProfile(
        name="rpi", imgsz=320, int8=True,
        metadata={"scenario": "Raspberry Pi real-time"},
    ),
    "coral": EdgeDeployProfile(
        name="coral", imgsz=320, int8=True,
        metadata={"scenario": "Coral Edge-TPU int8"},
    ),
    "mobile": EdgeDeployProfile(
        name="mobile", imgsz=416, int8=True,
        metadata={"scenario": "mobile LiteRT/NCNN/MNN"},
    ),
}

SUPPORTED_FORMATS = (
    "tflite", "edgetpu", "saved_model", "pb", "onnx", "openvino", "ncnn", "mnn", "coreml",
)


def get_profile(name: str) -> EdgeDeployProfile:
    if name not in BUILTIN_PROFILES:
        raise ValueError(f"Unknown profile '{name}'. Available: {sorted(BUILTIN_PROFILES)}")
    return BUILTIN_PROFILES[name]


def deploy_for_edge(
    model,
    params=None,
    formats: Optional[List[str]] = None,
    profile: Union[str, EdgeDeployProfile] = "default",
    output_dir: Optional[Union[str, Path]] = None,
    strict_preflight: bool = False,
    **overrides: Any,
) -> Dict[str, Path]:
    """Export a model for edge deployment with a single call.

    Args:
        model: a task model instance, a model-YAML name (built fresh), or a
            ``.npz`` checkpoint path.
        params: params tree (required when ``model`` is an instance).
        formats: export formats (default ["tflite"]).
        profile: profile name or EdgeDeployProfile.
        output_dir: artifact directory (default cwd).
        strict_preflight: raise instead of skip when the capability matrix
            refuses a (format, module) combination.
        **overrides: override profile fields (e.g. imgsz=416, int8=True).

    Returns:
        dict mapping format -> exported artifact Path (failures are logged
        and omitted, matching the reference's per-format error policy).
    """
    from .engine.exporter import EXPORT_FORMATS, export_model
    from .utils.export_preflight import export_preflight

    model, params = _resolve_model(model, params)
    if isinstance(profile, str):
        profile = get_profile(profile)
    for key, val in overrides.items():
        if hasattr(profile, key):
            setattr(profile, key, val)

    formats = list(formats or ["tflite"])
    invalid = [f for f in formats if f not in SUPPORTED_FORMATS]
    if invalid:
        raise ValueError(f"Unsupported formats: {invalid}. Supported: {SUPPORTED_FORMATS}")

    out_dir = Path(output_dir) if output_dir else Path(".")
    out_dir.mkdir(parents=True, exist_ok=True)
    results: Dict[str, Path] = {}
    for fmt in formats:
        try:
            pf = export_preflight(model, fmt, strict=strict_preflight)
            if not pf["ok"]:
                LOGGER.warning(f"[edge] {fmt}: preflight refused, skipping")
                continue
            suffix = EXPORT_FORMATS[fmt]["suffix"]
            stem = Path(str(getattr(model, "yaml_file", "model"))).stem
            out = out_dir / f"{stem}{suffix}"
            LOGGER.info(f"[edge] exporting → {fmt} (profile={profile.name}, imgsz={profile.imgsz})")
            path = export_model(
                model, params, fmt, imgsz=profile.imgsz, output=str(out),
                nms=profile.nms, int8=profile.int8, batch=profile.batch,
                max_det=profile.max_det, conf=profile.conf, iou=profile.iou,
            )
            results[fmt] = Path(path)
            LOGGER.info(f"[edge] ✓ {fmt}: {path}")
        except Exception as exc:  # per-format isolation (reference :123)
            LOGGER.error(f"[edge] ✗ {fmt} failed: {exc}")
    return results


def benchmark_edge_model(
    artifact: Union[str, Path],
    model=None,
    imgsz: int = 640,
    warmup: int = 3,
    runs: int = 20,
    conf: float = 0.25,
    iou: float = 0.45,
) -> Dict[str, float]:
    """Latency stats for an exported artifact through AutoBackend detect
    (reference edge/__init__.py:130-177: mean/p50/p95/fps)."""
    from .nn.autobackend import AutoBackend

    be = AutoBackend(weights=str(artifact), model=model)
    x = np.random.default_rng(0).uniform(0, 1, (1, imgsz, imgsz, 3)).astype(np.float32)
    for _ in range(warmup):
        be.detect(x, conf=conf, iou=iou)
    lat = []
    for _ in range(runs):
        t0 = time.perf_counter()
        be.detect(x, conf=conf, iou=iou)
        lat.append((time.perf_counter() - t0) * 1000)
    lat.sort()
    mean_ms = sum(lat) / len(lat)
    return {
        "mean_ms": mean_ms,
        "p50_ms": lat[len(lat) // 2],
        "p95_ms": lat[min(len(lat) - 1, int(len(lat) * 0.95))],
        "fps": 1000.0 / mean_ms if mean_ms > 0 else 0.0,
        "runs": float(runs),
    }


def _resolve_model(model, params):
    """Accept a model instance (+params), a YAML name, or an .npz checkpoint."""
    if isinstance(model, (str, Path)):
        s = str(model)
        if s.endswith(".npz"):
            from .nn.autobackend import AutoBackend

            be = AutoBackend(weights=s)
            return be.model, be.params
        from .nn.tasks import DetectionModel

        m = DetectionModel(s)
        return m, m.init_params(0)
    if params is None:
        raise ValueError("params required when passing a model instance")
    return model, params
