"""Reference default.yaml reconciliation gate (VERDICT r2 item 8 tail):
every reference key must be native, aliased, accepted, or rejected-with-
reason — no silent drops."""

import re
from pathlib import Path

import pytest

REF_YAML = Path("/root/reference/ultralytics/cfg/default.yaml")


def _keys(path):
    out = []
    for line in path.read_text().splitlines():
        m = re.match(r"^([A-Za-z_][A-Za-z0-9_]*):", line)
        if m:
            out.append(m.group(1))
    return out


@pytest.mark.skipif(not REF_YAML.exists(), reason="reference not mounted")
def test_every_reference_key_reconciled():
    from yolo_master_tpu.cfg.compat import resolve_key

    unknown = []
    for key in _keys(REF_YAML):
        kind, _ = resolve_key(key)
        if kind == "unknown":
            unknown.append(key)
    assert not unknown, f"unreconciled reference config keys: {unknown}"


def test_alias_and_accept_and_reject_paths():
    from yolo_master_tpu.cfg.cli import parse_args

    cfg = parse_args(["moe=0.05"])  # alias -> moe_gain
    assert cfg["moe_gain"] == 0.05

    cfg = parse_args(["cls_pw=2.0"])  # accepted new key
    assert cfg["cls_pw"] == 2.0

    with pytest.raises(SystemExit, match="not supported on the TPU path"):
        parse_args(["lora_use_dora=true"])


def test_aliases_point_at_real_keys():
    from yolo_master_tpu.cfg import get_default_cfg
    from yolo_master_tpu.cfg.compat import ALIASES

    cfg = get_default_cfg()
    bad = {k: v for k, v in ALIASES.items() if v not in cfg}
    assert not bad, f"aliases to nonexistent keys: {bad}"
