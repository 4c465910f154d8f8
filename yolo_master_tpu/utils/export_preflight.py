"""Export preflight: capability matrix + per-module export decisions +
executable roundtrip validation.

Reference behavior: utils/export_capabilities.py (matrix load/validate/alias
normalization), utils/export_preflight.py (ExportDecision per routed module,
strict refusal), utils/export_validation.py:38 (export → reload → execute →
numeric compare). TPU recast: routed modules are located by walking the
model's LayerSpec graph (nn/tasks.py parse_model output) instead of
``nn.Module.named_modules``, and the roundtrip executes through AutoBackend
against the jitted native forward.
"""

from __future__ import annotations

from copy import deepcopy
from dataclasses import asdict, dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Mapping, Optional

import numpy as np

from . import LOGGER

DEFAULT_MATRIX_PATH = Path(__file__).resolve().parent.parent / "cfg" / "export-capability-matrix.yaml"
REQUIRED_MODULES = frozenset({"MoE", "MoA", "MoT", "MoLoRA", "Latent"})
REQUIRED_FORMAT_FIELDS = frozenset({"supported", "default", "known_error"})
REQUIRED_MODULE_FIELDS = frozenset({"supported", "dense_fallback", "requires_merge", "known_error"})
VALID_STRATEGIES = frozenset({"dynamic", "dense_fallback", "refuse"})

# public exporter aliases → matrix keys (reference export_capabilities.py:24)
_FORMAT_ALIASES = {
    "-": "npz",
    "pt": "npz",
    "pytorch": "npz",
    "tensorrt": "engine",
    "trt": "engine",
    "mlmodel": "coreml",
    "mlpackage": "coreml",
    "mlprogram": "coreml",
    "apple": "coreml",
    "ios": "coreml",
    "tflite": "litert",
}


def normalize_export_format(fmt: str) -> str:
    value = str(fmt).strip().lower()
    return _FORMAT_ALIASES.get(value, value)


def validate_export_capability_matrix(matrix: Mapping[str, Any]) -> Dict[str, Any]:
    """Validate and return a detached matrix dict (reference :40-111)."""
    if not isinstance(matrix, Mapping):
        raise ValueError("export capability matrix must be a mapping")
    if matrix.get("schema_version") != 1:
        raise ValueError("export capability matrix schema_version must be 1")
    formats = matrix.get("formats")
    modules = matrix.get("modules")
    if not isinstance(formats, Mapping) or not formats:
        raise ValueError("export capability matrix formats must be a non-empty mapping")
    if not isinstance(modules, Mapping):
        raise ValueError("export capability matrix modules must be a mapping")
    missing_modules = sorted(REQUIRED_MODULES - set(modules))
    if missing_modules:
        raise ValueError(f"export capability matrix missing module families: {missing_modules}")

    for name, cap in formats.items():
        if not isinstance(cap, Mapping):
            raise ValueError(f"format {name!r} capability must be a mapping")
        missing = sorted(REQUIRED_FORMAT_FIELDS - set(cap))
        if missing:
            raise ValueError(f"format {name!r} missing required fields: {missing}")
        if not isinstance(cap["supported"], bool):
            raise ValueError(f"format {name!r} supported must be bool")
        if cap["default"] not in VALID_STRATEGIES:
            raise ValueError(f"format {name!r} has invalid default strategy {cap['default']!r}")
        if not cap["supported"] and cap["default"] != "refuse":
            raise ValueError(f"unsupported format {name!r} must use the refuse strategy")
        if cap["known_error"] is not None and not isinstance(cap["known_error"], str):
            raise ValueError(f"format {name!r} known_error must be a string or null")

    for family in REQUIRED_MODULES:
        cap = modules[family]
        if not isinstance(cap, Mapping):
            raise ValueError(f"module {family!r} capability must be a mapping")
        missing = sorted(REQUIRED_MODULE_FIELDS - set(cap))
        if missing:
            raise ValueError(f"module {family!r} missing required fields: {missing}")
        for f in ("supported", "dense_fallback", "requires_merge"):
            if not isinstance(cap[f], bool):
                raise ValueError(f"module {family!r} {f} must be bool")
        if cap["known_error"] is not None and not isinstance(cap["known_error"], str):
            raise ValueError(f"module {family!r} known_error must be a string or null")
        overrides = cap.get("formats", {})
        if not isinstance(overrides, Mapping):
            raise ValueError(f"module {family!r} formats override must be a mapping")
        unknown = sorted(set(overrides) - set(formats))
        if unknown:
            raise ValueError(f"module {family!r} has overrides for unknown formats: {unknown}")
        for fmt, override in overrides.items():
            if not isinstance(override, Mapping) or override.get("strategy") not in VALID_STRATEGIES:
                raise ValueError(f"module {family!r} override for {fmt!r} needs a valid strategy")
    return {k: deepcopy(dict(v)) if isinstance(v, Mapping) else v for k, v in matrix.items()}


def load_export_capability_matrix(path: Optional[str | Path] = None) -> Dict[str, Any]:
    import yaml

    p = Path(path) if path else DEFAULT_MATRIX_PATH
    with open(p) as f:
        matrix = yaml.safe_load(f)
    out = validate_export_capability_matrix(matrix)
    out["source"] = str(p)
    return out


# ---------------------------------------------------------------------------
# Module classification + decisions
# ---------------------------------------------------------------------------

def classify_routed_module(type_name: str) -> Optional[str]:
    """Map a LayerSpec type name to a capability family, or None if unrouted."""
    if type_name in ("C2fMoA", "MoABlock", "NeckMoAFusion"):
        return "MoA"
    if type_name in ("C2fMoT", "MoTBlock"):
        return "MoT"
    if "Latent" in type_name:
        return "Latent"
    from ..nn.tasks import MIXTURE_MODULES, MODULE_REGISTRY

    cls = MODULE_REGISTRY.get(type_name)
    if cls is not None and cls in MIXTURE_MODULES:
        return "MoE"
    return None


@dataclass
class ExportDecision:
    module: str  # layer path, e.g. "layers.6"
    module_type: str  # class/type name
    module_family: str  # MoE / MoA / MoT / Latent / MoLoRA
    backend: str  # normalized format key
    supported: bool
    strategy: str  # dynamic | dense_fallback | refuse
    dense_fallback: bool
    requires_merge: bool
    known_error: Optional[str] = None

    def to_dict(self) -> Dict[str, Any]:
        return asdict(self)


def _resolve(matrix: Dict[str, Any], family: str, fmt: str) -> Dict[str, Any]:
    fcap = matrix["formats"][fmt]
    mcap = matrix["modules"][family]
    strategy = fcap["default"]
    override = (mcap.get("formats") or {}).get(fmt)
    if override is not None:
        strategy = override["strategy"]
    supported = bool(fcap["supported"]) and bool(mcap["supported"]) and strategy != "refuse"
    if strategy == "dense_fallback" and not mcap["dense_fallback"]:
        # family cannot run dense → the combination refuses
        strategy, supported = "refuse", False
    return {
        "supported": supported,
        "strategy": strategy,
        "dense_fallback": strategy == "dense_fallback",
        "requires_merge": bool(mcap["requires_merge"]),
        "known_error": fcap["known_error"] or mcap["known_error"],
    }


def export_preflight(
    model,
    fmt: str,
    *,
    peft_state: Optional[dict] = None,
    matrix: Optional[Mapping[str, Any]] = None,
    matrix_path: Optional[str | Path] = None,
    strict: bool = True,
) -> Dict[str, Any]:
    """Per-routed-module export decisions for a format.

    Args:
        model: a task model carrying ``specs`` (parse_model LayerSpecs).
        fmt: public exporter format name (aliases accepted).
        peft_state: optional live PEFT/MoLoRA adapter state; when present and
            unmerged, a MoLoRA decision with requires_merge is emitted.
        strict: raise RuntimeError when any decision refuses.

    Returns:
        {"backend", "source", "decisions": [ExportDecision...], "ok": bool}
    """
    if matrix is not None and matrix_path is not None:
        raise ValueError("matrix and matrix_path are mutually exclusive")
    if matrix is not None:
        validated = validate_export_capability_matrix(matrix)
        source = str(matrix.get("source", "<in-memory>"))
    else:
        validated = load_export_capability_matrix(matrix_path)
        source = validated.pop("source")

    backend = normalize_export_format(fmt)
    if backend not in validated["formats"]:
        raise ValueError(f"unknown export format {fmt!r} (normalized {backend!r})")

    decisions: List[ExportDecision] = []
    for spec in getattr(model, "specs", []):
        family = classify_routed_module(spec.type_name)
        if family is None:
            continue
        r = _resolve(validated, family, backend)
        decisions.append(ExportDecision(
            module=f"layers.{spec.i}", module_type=spec.type_name,
            module_family=family, backend=backend, **r,
        ))
    if peft_state:
        r = _resolve(validated, "MoLoRA", backend)
        merged = bool(peft_state.get("merged", False))
        if r["requires_merge"] and not merged:
            r["supported"] = False
            r["strategy"] = "refuse"
        decisions.append(ExportDecision(
            module="peft", module_type="MoLoRA", module_family="MoLoRA",
            backend=backend, **r,
        ))

    ok = all(d.supported for d in decisions)
    refusals = [d for d in decisions if not d.supported]
    if refusals and strict:
        lines = "; ".join(f"{d.module}({d.module_type}): {d.known_error or d.strategy}" for d in refusals)
        raise RuntimeError(f"export preflight refused for format {backend!r}: {lines}")
    for d in refusals:
        LOGGER.warning(f"export preflight: {d.module} ({d.module_type}) unsupported for {backend}: {d.known_error}")
    return {"backend": backend, "source": source, "ok": ok,
            "decisions": [d.to_dict() for d in decisions]}


# ---------------------------------------------------------------------------
# Roundtrip validation (reference export_validation.py:38)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ExportRoundtripResult:
    format: str
    artifact_bytes: int
    outputs: int
    max_abs_error: float
    atol: float
    passed: bool

    def to_dict(self) -> Dict[str, Any]:
        return asdict(self)


def _artifact_bytes(path: Path) -> int:
    if path.is_dir():
        return sum(f.stat().st_size for f in path.rglob("*") if f.is_file())
    return path.stat().st_size if path.exists() else 0


def validate_export_roundtrip(
    model,
    params,
    fmt: str,
    *,
    imgsz: int = 64,
    atol: float = 1e-3,
    output: Optional[str] = None,
) -> ExportRoundtripResult:
    """Export, reload through AutoBackend, execute, and compare against the
    native decoded forward on the same input. BN is folded at export, so the
    native side folds too before comparing (numerically exact at eval)."""
    import jax
    import jax.numpy as jnp

    from ..engine.exporter import export_model
    from ..nn.autobackend import AutoBackend
    from .fuse import fuse_bn_params

    path = Path(export_model(model, params, fmt, imgsz=imgsz, nms=False, output=output))
    backend = AutoBackend(weights=str(path), model=model, nc=model.nc)

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, imgsz, imgsz, 3)).astype(np.float32)
    got = np.asarray(backend(x))

    from ..nn.module import Context

    fused = fuse_bn_params(params)
    preds = model.forward_train(fused, jnp.asarray(x), Context(training=False))
    want = np.asarray(model.head.decode(preds))
    err = float(np.max(np.abs(got.astype(np.float64) - want.astype(np.float64))))
    return ExportRoundtripResult(
        format=normalize_export_format(fmt), artifact_bytes=_artifact_bytes(path),
        outputs=int(np.prod(got.shape)), max_abs_error=err, atol=atol,
        passed=bool(err <= atol),
    )
