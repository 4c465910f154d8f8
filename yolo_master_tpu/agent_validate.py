"""Agent validation suites (reference agent/runtime/cli/validate.py — the
quick/contract/dry-run/smoke suite concept over the JSON skill contract).

Declarative cases: each has a suite tag, a request, and expectations on the
response payload. Run via

    python -m yolo_master_tpu.agent validate --suite contract
    python -m yolo_master_tpu.agent validate --suite all --json-report out.json

Exit 0 iff every selected case passes. Suites:

  quick     — dispatcher wiring: doctor + every skill resolves
  dry-run   — dry_run=True returns a plan (no execution) for every skill
  contract  — structured error contract: unknown skill / missing inputs /
              bad payloads come back as {"status": "failed", "error": ...}
              without raising; response schema keys always present
  fast-smoke — tiny real executions (model.inspect, predict on a generated
              image, moe.diagnose, lora.diagnose); "smoke" is a legacy alias
  cli-smoke — the skill CLI subprocess end-to-end (doctor round-trip)
  deep-smoke — tiny real train (1 epoch) + val through the skill contract
  extended  — export + moe-prune through the contract
  all       — everything above (the reference's 8-suite set,
              agent/runtime/cli/validate.py)
"""

from __future__ import annotations

import json
import time
from typing import Any, Callable, Dict, List

from .agent import HANDLERS, dispatch

MINI_CFG = {
    "nc": 2,
    "backbone": [
        [-1, 1, "Conv", [8, 3, 2]],
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "ES_MOE", [16]],
    ],
    "head": [[[2], 1, "Detect", ["nc"]]],
}

# skills whose dry-run requires specific inputs
_DRY_INPUTS = {
    "yolo.train": {"data": "dummy.yaml"},
    "yolo.val": {"data": "dummy.yaml"},
    "yolo.tune": {"data": "dummy.yaml"},
    "yolo.predict": {"source": "img.jpg"},
    "yolo.track": {"source": "img.jpg"},
    "yolo.eval.sparse_sahi_compare": {"source": "img.jpg"},
    "yolo.eval.peft_compare": {"data": "dummy.yaml"},
    "yolo.multimodal.infer": {"source": "img.jpg", "classes": ["person"]},
    "yolo.solutions.run": {"source": "img.jpg", "app": "counter"},
}


def _schema_ok(payload: dict) -> str:
    for k in ("skill", "status", "summary"):
        if k not in payload:
            return f"response missing key '{k}'"
    if payload["status"] not in ("ok", "failed"):
        return f"bad status {payload['status']!r}"
    return ""


def _expect_ok(payload: dict) -> str:
    err = _schema_ok(payload)
    if err:
        return err
    if payload["status"] != "ok":
        return f"expected ok, got failed: {payload.get('summary')}"
    return ""


def _expect_failed(err_type: str | None = None):
    def check(payload: dict) -> str:
        err = _schema_ok(payload)
        if err:
            return err
        if payload["status"] != "failed":
            return "expected failed status"
        if "error" not in payload or "type" not in payload["error"]:
            return "failed payload missing structured error"
        if err_type and payload["error"]["type"] != err_type:
            return f"expected error type {err_type}, got {payload['error']['type']}"
        return ""

    return check


def build_cases(tmp_dir: str) -> List[Dict[str, Any]]:
    import numpy as np

    cases: List[Dict[str, Any]] = []

    # -- quick ---------------------------------------------------------------
    cases.append({"suite": "quick", "name": "doctor",
                  "request": {"skill": "yolo.system.doctor"}, "check": _expect_ok})
    cases.append({
        "suite": "quick", "name": "handlers-registered",
        "request": {"skill": "yolo.system"},
        "check": lambda p: "" if len(HANDLERS) >= 17 else f"only {len(HANDLERS)} handlers",
    })

    # -- dry-run: every skill must produce a plan without executing ----------
    for skill in sorted(HANDLERS):
        if skill in ("yolo.system", "yolo.system.doctor"):
            continue  # doctor has no destructive action to plan
        req = {"skill": skill, "dry_run": True, "inputs": dict(_DRY_INPUTS.get(skill, {}))}
        req["inputs"].setdefault("model", MINI_CFG)

        def check_plan(p, skill=skill):
            err = _expect_ok(p)
            if err:
                return err
            if not p.get("dry_run") or "plan" not in p or "target" not in p["plan"]:
                return f"{skill}: dry-run response carries no plan"
            return ""

        cases.append({"suite": "dry-run", "name": f"plan:{skill}", "request": req, "check": check_plan})

    # -- contract ------------------------------------------------------------
    cases += [
        {"suite": "contract", "name": "unknown-skill",
         "request": {"skill": "yolo.nope"}, "check": _expect_failed("ValueError")},
        {"suite": "contract", "name": "no-skill-key",
         "request": {"inputs": {}}, "check": _expect_failed("ValueError")},
        {"suite": "contract", "name": "train-missing-data",
         "request": {"skill": "yolo.train", "inputs": {"model": MINI_CFG}},
         "check": _expect_failed("ValueError")},
        {"suite": "contract", "name": "predict-missing-source",
         "request": {"skill": "yolo.predict", "inputs": {"model": MINI_CFG}},
         "check": _expect_failed("ValueError")},
        {"suite": "contract", "name": "multimodal-missing-classes",
         "request": {"skill": "yolo.multimodal.infer", "inputs": {"source": "x.jpg"}},
         "check": _expect_failed("ValueError")},
        {"suite": "contract", "name": "solutions-unknown-app",
         "request": {"skill": "yolo.solutions.run",
                     "inputs": {"model": MINI_CFG, "app": "bogus", "source": "x.jpg"}},
         "check": _expect_failed("ValueError")},
        {"suite": "contract", "name": "predict-bad-source-is-failed-payload",
         "request": {"skill": "yolo.predict",
                     "inputs": {"model": MINI_CFG, "source": "/nonexistent/zzz.jpg"}},
         "check": _expect_failed()},
    ]

    # -- smoke: tiny real runs ----------------------------------------------
    img_path = f"{tmp_dir}/smoke.png"

    def _write_img():
        import cv2

        cv2.imwrite(img_path, np.random.default_rng(0).integers(0, 255, (96, 96, 3)).astype("uint8"))
        return img_path

    cases += [
        {"suite": "fast-smoke", "name": "inspect", "setup": None,
         "request": {"skill": "yolo.model.inspect", "inputs": {"model": MINI_CFG},
                     "params": {"imgsz": 64}},
         "check": _expect_ok},
        {"suite": "fast-smoke", "name": "predict-real-image", "setup": _write_img,
         "request": {"skill": "yolo.predict",
                     "inputs": {"model": MINI_CFG, "source": img_path},
                     "params": {"imgsz": 64}},
         "check": _expect_ok},
        {"suite": "fast-smoke", "name": "moe-diagnose",
         "request": {"skill": "yolo.moe.diagnose", "inputs": {"model": MINI_CFG}},
         "check": _expect_ok},
        {"suite": "fast-smoke", "name": "lora-diagnose",
         "request": {"skill": "yolo.lora.diagnose", "inputs": {"model": MINI_CFG},
                     "params": {"rank": 4}},
         "check": _expect_ok},
    ]

    # -- cli-smoke: the skill CLI subprocess end-to-end ----------------------
    def _cli_doctor():
        import os
        import subprocess
        import sys

        # pin the jax platform in the child BEFORE backend init: validation
        # must not depend on accelerator-tunnel health (YMT_VALIDATE_PLATFORM
        # overrides, e.g. "tpu" on a known-good rig)
        platform = os.environ.get("YMT_VALIDATE_PLATFORM", "cpu")
        boot = (
            "import sys, jax; jax.config.update('jax_platforms', %r); "
            "from yolo_master_tpu.agent import main; sys.exit(main(sys.argv[1:]))" % platform
        )
        out = subprocess.run(
            [sys.executable, "-c", boot,
             "--json", json.dumps({"skill": "yolo.system.doctor"})],
            capture_output=True, text=True, timeout=300,
        )
        if out.returncode != 0:
            return f"cli exit {out.returncode}: {out.stderr[-300:]}"
        payload = json.loads(out.stdout.strip().splitlines()[-1])
        return None if payload.get("status") == "ok" else f"cli payload: {payload}"

    cases.append({"suite": "cli-smoke", "name": "cli-doctor",
                  "request": {"skill": "yolo.system.doctor"},  # re-checked in-process too
                  "check": lambda payload: _cli_doctor()})

    # -- deep-smoke: tiny real train + val through the skill contract --------
    data_yaml = f"{tmp_dir}/ds/data.yaml"

    def _write_ds():
        import cv2

        from pathlib import Path

        rng = np.random.default_rng(0)
        root = Path(tmp_dir) / "ds"
        for split in ("train", "val"):
            (root / f"images/{split}").mkdir(parents=True, exist_ok=True)
            (root / f"labels/{split}").mkdir(parents=True, exist_ok=True)
            for i in range(4):
                img = np.full((64, 64, 3), 110, np.uint8)
                cv2.rectangle(img, (16, 16), (48, 48), (0, 0, 230), -1)
                cv2.imwrite(str(root / f"images/{split}/{i}.png"), img)
                (root / f"labels/{split}/{i}.txt").write_text("0 0.5 0.5 0.5 0.5")
        (root / "data.yaml").write_text(
            f"path: {root}\ntrain: images/train\nval: images/val\nnames:\n  0: box\n")
        return data_yaml

    cases += [
        {"suite": "deep-smoke", "name": "train-1epoch", "setup": _write_ds,
         "request": {"skill": "yolo.train",
                     "inputs": {"model": MINI_CFG, "data": data_yaml},
                     "params": {"epochs": 1, "batch": 4, "imgsz": 64, "max_gt": 4,
                                "val": False, "save_dir": f"{tmp_dir}/run"}},
         "check": _expect_ok},
        {"suite": "deep-smoke", "name": "val-after-train", "setup": _write_ds,
         "request": {"skill": "yolo.val",
                     "inputs": {"model": MINI_CFG, "data": data_yaml},
                     "params": {"imgsz": 64, "batch": 4, "max_gt": 4}},
         "check": _expect_ok},
    ]

    # -- extended: export + moe prune through the contract -------------------
    cases += [
        {"suite": "extended", "name": "export-npz",
         "request": {"skill": "yolo.export", "inputs": {"model": MINI_CFG},
                     "params": {"format": "npz", "imgsz": 64,
                                "output": f"{tmp_dir}/m.npz"}},
         "check": _expect_ok},
        {"suite": "extended", "name": "moe-prune",
         "request": {"skill": "yolo.moe.prune", "inputs": {"model": MINI_CFG},
                     "params": {"threshold": 0.1}},
         "check": _expect_ok},
    ]
    return cases


def run_suite(suite: str = "quick", tmp_dir: str = "/tmp", verbose: bool = True) -> Dict[str, Any]:
    suite = {"smoke": "fast-smoke"}.get(suite, suite)  # legacy alias
    cases = [c for c in build_cases(tmp_dir) if suite == "all" or c["suite"] == suite]
    if not cases:
        raise ValueError(f"unknown suite '{suite}' (quick|fast-smoke|cli-smoke|dry-run|contract|deep-smoke|extended|all)")
    results = []
    for case in cases:
        if case.get("setup"):
            case["setup"]()
        t0 = time.perf_counter()
        payload = dispatch(case["request"])
        err = case["check"](payload)
        results.append({
            "suite": case["suite"], "name": case["name"], "ok": not err,
            "error": err or None, "sec": round(time.perf_counter() - t0, 3),
        })
        if verbose:
            mark = "PASS" if not err else "FAIL"
            print(f"[{mark}] {case['suite']}/{case['name']}" + (f" — {err}" if err else ""))
    n_ok = sum(r["ok"] for r in results)
    report = {"suite": suite, "passed": n_ok, "total": len(results), "cases": results}
    if verbose:
        print(f"{n_ok}/{len(results)} passed")
    return report


def main(argv=None) -> int:
    import argparse
    import tempfile

    ap = argparse.ArgumentParser(description="agent skill-contract validation suites")
    ap.add_argument("--suite", default="quick",
                    choices=["quick", "fast-smoke", "cli-smoke", "dry-run", "contract",
                             "deep-smoke", "extended", "smoke", "all"])
    ap.add_argument("--json-report", help="write the full report to this path")
    args = ap.parse_args(argv)
    with tempfile.TemporaryDirectory() as td:
        report = run_suite(args.suite, tmp_dir=td)
    if args.json_report:
        from pathlib import Path

        Path(args.json_report).write_text(json.dumps(report, indent=2))
    return 0 if report["passed"] == report["total"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
