"""Agent skill layer: a JSON-contract dispatcher for LLM/automation callers
(reference: agent/runtime/cli/dispatcher.py + core_handlers.py, 10.4k LoC —
the contract is: request {"skill", "inputs", "params", "dry_run"} -> response
{"skill", "status": ok|failed, "summary", ...}; exit 0 iff status ok).

Usage:
    python -m yolo_master_tpu.agent --json '{"skill": "yolo.system"}'
    echo '{"skill": "yolo.predict", "inputs": {"model": "yolo-master-n",
          "source": "img.jpg"}}' | python -m yolo_master_tpu.agent

Every runner maps onto the public framework APIs; ``dry_run: true`` returns
the execution plan without running anything (the reference's plan_response).
"""

from __future__ import annotations

import json
import sys
import traceback
from pathlib import Path
from typing import Any, Callable, Dict

from .utils import LOGGER


def response(skill: str, status: str, summary: str, **kw) -> Dict[str, Any]:
    return {"skill": skill, "status": status, "summary": summary, **kw}


def plan_response(request: dict, summary: str, target: str) -> Dict[str, Any]:
    return response(
        request["skill"], "ok", summary, dry_run=True,
        plan={"target": target, "inputs": request.get("inputs", {}), "params": request.get("params", {})},
    )


def _yolo(inputs: dict):
    from .models.yolo import YOLO

    return YOLO(inputs.get("model", "yolo-master-n"), task=inputs.get("task"))


# ---------------------------------------------------------------------------
# Runners
# ---------------------------------------------------------------------------

def run_system(request: dict) -> dict:
    """Environment doctor (reference yolo.system.doctor)."""
    import jax

    import yolo_master_tpu

    devs = [str(d) for d in jax.devices()]
    return response(
        request["skill"], "ok", f"{len(devs)} device(s), backend {jax.default_backend()}",
        devices=devs, backend=jax.default_backend(), jax_version=jax.__version__,
        framework_version=getattr(yolo_master_tpu, "__version__", "0.1.0"),
    )


def run_model_inspect(request: dict) -> dict:
    inputs = request.get("inputs", {})
    if request.get("dry_run"):
        return plan_response(request, "inspect model", "utils.info.model_info")
    y = _yolo(inputs)
    info = y.info(imgsz=int(request.get("params", {}).get("imgsz", 640)))
    return response(request["skill"], "ok", f"{info['params']:,} params, {info['gflops']} GFLOPs", **info)


def run_train(request: dict) -> dict:
    inputs = request.get("inputs", {})
    params = dict(request.get("params", {}))
    if not inputs.get("data"):
        raise ValueError("yolo.train requires inputs.data")
    if request.get("dry_run"):
        return plan_response(request, "train model", "engine.trainers_task")
    y = _yolo(inputs)
    out = y.train(data=inputs["data"], **params)
    return response(request["skill"], "ok", f"trained: fitness {out.get('best_fitness', 0):.4f}",
                    metrics={k: float(v) for k, v in out.items() if isinstance(v, (int, float))})


def run_val(request: dict) -> dict:
    inputs = request.get("inputs", {})
    if not inputs.get("data"):
        raise ValueError("yolo.val requires inputs.data")
    if request.get("dry_run"):
        return plan_response(request, "validate model", "engine.validator")
    y = _yolo(inputs)
    out = y.val(data=inputs["data"], **request.get("params", {}))
    return response(request["skill"], "ok", f"mAP50-95 {out.get('mAP50-95', out.get('fitness', 0)):.4f}",
                    metrics={k: float(v) for k, v in out.items() if isinstance(v, (int, float))})


def run_predict(request: dict, mode: str = "predict") -> dict:
    inputs = request.get("inputs", {})
    if not inputs.get("source"):
        raise ValueError(f"yolo.{mode} requires inputs.source")
    if request.get("dry_run"):
        return plan_response(request, f"{mode} over source", "engine.predictor")
    y = _yolo(inputs)
    fn = y.track if mode == "track" else y.predict
    results = fn(inputs["source"], **request.get("params", {}))
    rows = []
    for r in results:
        row = {"path": r.path, "detections": len(r)}
        if mode == "track" and getattr(r, "tracks", None) is not None:
            row["track_ids"] = [int(t[4]) for t in r.tracks]
        rows.append(row)
    return response(request["skill"], "ok", f"{len(rows)} result(s)", results=rows)


def run_export(request: dict) -> dict:
    inputs = request.get("inputs", {})
    params = request.get("params", {})
    if request.get("dry_run"):
        return plan_response(request, "export model", "engine.exporter")
    y = _yolo(inputs)
    path = y.export(format=params.get("format", "saved_model"), imgsz=int(params.get("imgsz", 640)),
                    nms=bool(params.get("nms", True)), output=params.get("output"))
    return response(request["skill"], "ok", f"exported to {path}", artifact=path)


def run_benchmark(request: dict) -> dict:
    inputs = request.get("inputs", {})
    params = request.get("params", {})
    if request.get("dry_run"):
        return plan_response(request, "benchmark export formats", "YOLO.benchmark")
    y = _yolo(inputs)
    out = y.benchmark(imgsz=int(params.get("imgsz", 640)),
                      formats=tuple(params.get("formats", ("npz", "stablehlo"))), data=params.get("data"))
    ok = sum(1 for v in out.values() if v.get("ok"))
    return response(request["skill"], "ok", f"{ok}/{len(out)} formats ok", results=out)


def run_tune(request: dict) -> dict:
    inputs = request.get("inputs", {})
    params = dict(request.get("params", {}))
    if not inputs.get("data"):
        raise ValueError("yolo.tune requires inputs.data")
    if request.get("dry_run"):
        return plan_response(request, "evolve hyperparameters", "engine.tuner")
    y = _yolo(inputs)
    best = y.tune(data=inputs["data"], iterations=int(params.pop("iterations", 5)),
                  epochs=int(params.pop("epochs", 5)), **params)
    return response(request["skill"], "ok", "tuning done", best_hyp=best)


def run_moe_diagnose(request: dict) -> dict:
    """Routing health report (reference yolo.lora.diagnose / moe analysis)."""
    inputs = request.get("inputs", {})
    if request.get("dry_run"):
        return plan_response(request, "diagnose MoE routing", "nn.moe.analysis.diagnose_model")
    import numpy as np

    from .nn.moe.analysis import diagnose_model

    y = _yolo(inputs)
    rng = np.random.default_rng(0)
    batches = [rng.uniform(0, 1, (2, 96, 96, 3)).astype(np.float32) for _ in range(2)]
    report = diagnose_model(y.model, y.params, batches)
    return response(request["skill"], "ok", f"{len(report.get('blocks', report))} routed blocks", report=report)


def run_moe_prune(request: dict) -> dict:
    inputs = request.get("inputs", {})
    params = request.get("params", {})
    if request.get("dry_run"):
        return plan_response(request, "prune underused experts", "nn.moe.pruning")
    import numpy as np

    from .nn.moe.pruning import collect_usage_stats, prune_moe_model

    y = _yolo(inputs)
    rng = np.random.default_rng(0)
    batches = [rng.uniform(0, 1, (2, 96, 96, 3)).astype(np.float32) for _ in range(2)]
    usage = collect_usage_stats(y.model, y.params, batches)
    model2, params2 = prune_moe_model(y.model, y.params, usage,
                                      threshold=float(params.get("threshold", 0.15)))
    report = {k: v.tolist() for k, v in usage.items()}
    out_path = params.get("output")
    if out_path:
        from .utils.checkpoint import save_params_npz

        save_params_npz(params2, out_path)
    return response(request["skill"], "ok", "pruned", report=report, artifact=out_path)


def run_sahi_compare(request: dict) -> dict:
    """Dense vs sparse-SAHI comparison (reference yolo.eval.sparse_sahi_compare)."""
    inputs = request.get("inputs", {})
    if not inputs.get("source"):
        raise ValueError("requires inputs.source")
    if request.get("dry_run"):
        return plan_response(request, "compare dense vs sparse-SAHI", "engine.sahi")
    import time

    import cv2

    from .engine.sahi import SparseSAHIPredictor

    y = _yolo(inputs)
    im = cv2.imread(str(inputs["source"]))
    params = request.get("params", {})
    t0 = time.perf_counter()
    dense = y.predict(im, conf=float(params.get("conf", 0.25)))
    t_dense = time.perf_counter() - t0
    sp = SparseSAHIPredictor(y.model, y.params, slice_size=int(params.get("slice_size", 640)))
    t0 = time.perf_counter()
    sparse = sp(im)
    t_sparse = time.perf_counter() - t0
    return response(
        request["skill"], "ok", "compared",
        dense={"detections": len(dense[0]), "sec": round(t_dense, 3)},
        sparse={"detections": len(sparse), "sec": round(t_sparse, 3)},
    )


def run_solutions(request: dict) -> dict:
    inputs = request.get("inputs", {})
    params = request.get("params", {})
    app = inputs.get("app", "counter")
    if request.get("dry_run"):
        return plan_response(request, f"run solutions app '{app}'", f"solutions.{app}")
    from . import solutions

    apps = {
        "counter": lambda: solutions.ObjectCounter(line=params.get("line", ((0, 0), (0, 100)))),
        "heatmap": lambda: solutions.Heatmap(shape=tuple(params.get("shape", (64, 64)))),
        "queue": lambda: solutions.QueueManager(region=params.get("region", [(0, 0), (50, 0), (50, 50), (0, 50)])),
        "trackzone": lambda: solutions.TrackZone(zone=params.get("zone", [(0, 0), (50, 0), (50, 50), (0, 50)])),
        "analytics": lambda: solutions.Analytics(),
    }
    if app not in apps:
        raise ValueError(f"unknown solutions app '{app}' (choices: {sorted(apps)})")
    sol = apps[app]()
    y = _yolo(inputs)
    n_frames = 0
    for r in y.track(inputs["source"], stream=True, conf=float(params.get("conf", 0.25))):
        sol.update(r.tracks)
        n_frames += 1
    state = {k: v for k, v in vars(sol).items() if isinstance(v, (int, float, str))}
    return response(request["skill"], "ok", f"{app} over {n_frames} frames", state=state)


def run_lora_diagnose(request: dict) -> dict:
    """LoRA placement diagnosis (reference yolo.lora.diagnose): plan the
    adapter targets + parameter budget for a model without training."""
    inputs = request.get("inputs", {})
    params = request.get("params", {})
    if request.get("dry_run"):
        return plan_response(request, "diagnose LoRA placement", "peft.lora.plan_lora_targets")
    from .peft.lora import LoRAConfig, init_lora, lora_param_count, plan_lora_targets

    y = _yolo(inputs)
    cfg = LoRAConfig(r=int(params.get("rank", 8)), alpha=float(params.get("alpha", 16.0)))
    targets = plan_lora_targets(y.params, cfg)
    adapters = init_lora(y.params, cfg, targets)
    return response(
        request["skill"], "ok", f"{len(targets)} LoRA targets, {lora_param_count(adapters):,} adapter params",
        targets=targets[:50], n_targets=len(targets), adapter_params=lora_param_count(adapters),
        rank=cfg.r,
    )


def run_peft_compare(request: dict) -> dict:
    """PEFT-vs-full-finetune comparison (reference yolo.eval.peft_compare):
    two short trainings on the same data, one with LoRA adapters, one full."""
    inputs = request.get("inputs", {})
    params = dict(request.get("params", {}))
    if not inputs.get("data"):
        raise ValueError("yolo.eval.peft_compare requires inputs.data")
    if request.get("dry_run"):
        return plan_response(request, "compare LoRA vs full finetune", "peft.controller + trainer")
    epochs = int(params.pop("epochs", 2))
    rank = int(params.pop("rank", 8))
    rows = {}
    for name, peft in (("full", None), ("lora", {"variant": "lora", "rank": rank})):
        y = _yolo(inputs)
        out = y.train(data=inputs["data"], epochs=epochs, peft=peft, **params)
        rows[name] = {k: float(v) for k, v in out.items() if isinstance(v, (int, float))}
    delta = rows["lora"].get("best_fitness", 0.0) - rows["full"].get("best_fitness", 0.0)
    return response(request["skill"], "ok", f"lora-full fitness delta {delta:+.4f}",
                    full=rows["full"], lora=rows["lora"], fitness_delta=delta)


def run_multimodal_infer(request: dict) -> dict:
    """Open-vocabulary inference (reference yolo.multimodal.infer): YOLOWorld
    with a caller-supplied class vocabulary."""
    inputs = request.get("inputs", {})
    if not inputs.get("source"):
        raise ValueError("yolo.multimodal.infer requires inputs.source")
    classes = inputs.get("classes")
    if not classes:
        raise ValueError("yolo.multimodal.infer requires inputs.classes (prompt vocabulary)")
    if request.get("dry_run"):
        return plan_response(request, "open-vocab predict", "models.yolo.set_classes + predictor")
    from .models.yolo import YOLO

    y = YOLO(inputs.get("model", "yolo-master-world"), task=inputs.get("task", "world"))
    y.set_classes(list(classes))
    results = y.predict(inputs["source"], **request.get("params", {}))
    rows = [{"path": r.path, "detections": len(r)} for r in results]
    return response(request["skill"], "ok", f"{len(rows)} result(s) over {len(classes)} prompts", results=rows)


def run_multimodal_fuse(request: dict) -> dict:
    """Fuse detector boxes with VLM proposals/verdicts (reference
    agent/runtime/multimodal/fusion.py build_multimodal_fusion_preview).
    Proposals arrive as data — the reference's wire format — so no VLM
    dependency is needed in-process."""
    if request.get("dry_run"):
        return plan_response(request, "fuse VLM proposals with detections", "openworld.fuse_detections")
    inputs = request.get("inputs", {})
    dets = inputs.get("detections")
    props = inputs.get("proposals")
    if dets is None or props is None:
        raise ValueError("yolo.multimodal.fuse requires inputs.detections and inputs.proposals")
    from .openworld import fuse_detections

    out = fuse_detections(list(dets), list(props), **request.get("params", {}))
    return response(
        request["skill"], "ok",
        f"{len(out['fused'])} fused ({len(out['added'])} added, {len(out['suppressed'])} suppressed)",
        **out,
    )


def run_open_world_eval(request: dict) -> dict:
    """Open-world taxonomy evaluation (reference agent/runtime/open_world/
    taxonomy.py): canonicalize predicted vs GT labels through alias/token
    matching and score IoU-matched label agreement."""
    if request.get("dry_run"):
        return plan_response(request, "open-world label comparison", "openworld.open_world_comparison")
    inputs = request.get("inputs", {})
    preds = inputs.get("predictions")
    gts = inputs.get("ground_truth")
    if preds is None or gts is None:
        raise ValueError("yolo.eval.open_world requires inputs.predictions and inputs.ground_truth")
    from .openworld import Taxonomy, open_world_comparison

    vocab = inputs.get("vocabulary")
    tax = Taxonomy(vocab, aliases=inputs.get("aliases")) if vocab else None
    rep = open_world_comparison(list(preds), list(gts), taxonomy=tax, **request.get("params", {}))
    return response(
        request["skill"], "ok",
        f"{rep['label_hits']}/{rep['matched']} matched boxes carry the right label "
        f"(P={rep['precision']:.2f} R={rep['recall']:.2f})",
        **rep,
    )


HANDLERS: Dict[str, Callable[[dict], dict]] = {
    "yolo.system": run_system,
    "yolo.system.doctor": run_system,
    "yolo.model.inspect": run_model_inspect,
    "yolo.train": run_train,
    "yolo.val": run_val,
    "yolo.predict": lambda r: run_predict(r, "predict"),
    "yolo.track": lambda r: run_predict(r, "track"),
    "yolo.export": run_export,
    "yolo.benchmark": run_benchmark,
    "yolo.tune": run_tune,
    "yolo.moe.diagnose": run_moe_diagnose,
    "yolo.moe.prune": run_moe_prune,
    "yolo.eval.sparse_sahi_compare": run_sahi_compare,
    "yolo.solutions.run": run_solutions,
    "yolo.lora.diagnose": run_lora_diagnose,
    "yolo.eval.peft_compare": run_peft_compare,
    "yolo.multimodal.infer": run_multimodal_infer,
    "yolo.multimodal.fuse": run_multimodal_fuse,
    "yolo.eval.open_world": run_open_world_eval,
}


def dispatch(request: dict) -> dict:
    """Route one JSON request; never raises (errors become failed payloads)."""
    skill = None
    try:
        skill = request.get("skill")
        if skill not in HANDLERS:
            raise ValueError(f"unsupported skill: {skill} (choices: {sorted(HANDLERS)})")
        return HANDLERS[skill](request)
    except Exception as exc:  # noqa: BLE001
        return response(skill or "unknown", "failed", str(exc),
                        error={"type": type(exc).__name__, "traceback": traceback.format_exc()})


def main(argv=None) -> int:
    import argparse

    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] == "validate":
        # validation suites (reference agent/runtime/cli/validate.py):
        # python -m yolo_master_tpu.agent validate --suite contract
        from .agent_validate import main as validate_main

        return validate_main(argv[1:])

    parser = argparse.ArgumentParser(description="JSON skill dispatcher for yolo_master_tpu")
    parser.add_argument("--request", help="path to a JSON request file")
    parser.add_argument("--json", help="inline JSON request")
    parser.add_argument("--pretty", action="store_true")
    args = parser.parse_args(argv)
    if args.request:
        request = json.loads(Path(args.request).read_text())
    elif args.json:
        request = json.loads(args.json)
    else:
        request = json.loads(sys.stdin.read())
    payload = dispatch(request)
    print(json.dumps(payload, indent=2 if args.pretty else None, default=str))
    return 0 if payload.get("status") == "ok" else 1


if __name__ == "__main__":
    raise SystemExit(main())
