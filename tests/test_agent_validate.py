"""Agent validation suites (VERDICT r2 item 9 — reference
agent/runtime/cli/validate.py suite concept over the JSON skill contract)."""

import pytest

from yolo_master_tpu.agent_validate import run_suite


@pytest.mark.parametrize("suite", ["quick", "contract", "dry-run"])
def test_fast_suites_green(suite, tmp_path):
    report = run_suite(suite, tmp_dir=str(tmp_path), verbose=False)
    failed = [c for c in report["cases"] if not c["ok"]]
    assert not failed, failed


@pytest.mark.slow
def test_smoke_suite_green(tmp_path):
    report = run_suite("smoke", tmp_dir=str(tmp_path), verbose=False)
    failed = [c for c in report["cases"] if not c["ok"]]
    assert not failed, failed


def test_validate_cli_exit_codes(tmp_path):
    from yolo_master_tpu.agent import main

    assert main(["validate", "--suite", "contract", "--json-report", str(tmp_path / "r.json")]) == 0
    import json

    rep = json.loads((tmp_path / "r.json").read_text())
    assert rep["passed"] == rep["total"] > 0
