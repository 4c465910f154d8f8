#!/usr/bin/env python3
"""Generate the named dataset-config zoo under yolo_master_tpu/cfg/datasets/.

The reference resolves ``data="VisDrone.yaml"`` by name against its bundled
dataset configs (reference: ultralytics/cfg/datasets/*.yaml, resolution in
ultralytics/utils/checks.py check_file). This script extracts the FACTUAL
spec of each dataset (root dir, split dirs, class names, keypoint shape,
download source) from the reference tree and re-emits it in this repo's own
compact format: flow-style names list, explicit `source:` provenance, no
download shell payloads (this framework is offline-first — `download:` is kept
only as a documentation URL string).

Run from the repo root:  python scripts/gen_dataset_zoo.py
"""
from __future__ import annotations

import sys
from pathlib import Path

import yaml

REF = Path("/root/reference/ultralytics/cfg/datasets")
OUT = Path(__file__).resolve().parents[1] / "yolo_master_tpu" / "cfg" / "datasets"

# Keep the zoo focused: every dataset a YOLO-Master user trains/evals on in the
# reference docs/scripts. The giant classification name-maps (ImageNet,
# Objects365, open-images) are resolved at runtime from the dataset itself.
INCLUDE = [
    "coco.yaml", "coco128.yaml", "coco8.yaml", "coco128-seg.yaml", "coco8-seg.yaml",
    "coco-pose.yaml", "coco8-pose.yaml", "VOC.yaml", "VisDrone.yaml", "SKU-110K.yaml",
    "AI-TOD-v2.yaml", "DOTAv1.yaml", "DOTAv1.5.yaml", "dota8.yaml", "Argoverse.yaml",
    "GlobalWheat2020.yaml", "TT100K.yaml", "african-wildlife.yaml", "brain-tumor.yaml",
    "crack-seg.yaml", "package-seg.yaml", "carparts-seg.yaml", "tiger-pose.yaml",
    "hand-keypoints.yaml", "dog-pose.yaml", "signature.yaml", "medical-pills.yaml",
    "HomeObjects-3K.yaml", "construction-ppe.yaml", "cityscapes.yaml", "cityscapes8.yaml",
    "ade20k.yaml",
]


def flow(seq) -> str:
    """Single-line flow-style YAML list with quoting only where needed."""
    return yaml.safe_dump(list(seq), default_flow_style=True, width=10**9, allow_unicode=True).strip()


def convert(src: Path) -> str | None:
    cfg = yaml.safe_load(src.read_text())
    if not isinstance(cfg, dict) or "names" not in cfg:
        return None
    names = cfg["names"]
    if isinstance(names, dict):
        names = [names[k] for k in sorted(names)]
    if len(names) > 400:  # name-map too large to vendor; runtime-resolved instead
        return None
    doc_url = None
    for line in src.read_text().splitlines():
        if "Documentation:" in line:
            doc_url = line.split("Documentation:", 1)[1].strip()
            break
    lines = [
        f"# {src.stem} — named dataset config (zoo analog of reference cfg/datasets/{src.name})",
        f"# source: {doc_url or 'see reference dataset card'}",
        "# Resolved by name: YOLO(...).train(data=\"%s\") finds this file when no" % src.name,
        "# local path matches; a relative `path:` is joined to settings datasets_dir.",
        "",
        f"path: {cfg.get('path', src.stem)}",
    ]
    for split in ("train", "val", "test"):
        if split in cfg and cfg[split] is not None:
            v = cfg[split]
            lines.append(f"{split}: {flow(v) if isinstance(v, list) else v}")
    if "kpt_shape" in cfg:
        lines.append(f"kpt_shape: {flow(cfg['kpt_shape'])}")
    if "flip_idx" in cfg:
        lines.append(f"flip_idx: {flow(cfg['flip_idx'])}")
    lines.append(f"nc: {len(names)}")
    lines.append(f"names: {flow(names)}")
    dl = cfg.get("download")
    if isinstance(dl, str) and dl.strip().startswith("http") and "\n" not in dl.strip():
        lines.append(f"download: {dl.strip()}  # documentation pointer only (offline-first)")
    return "\n".join(lines) + "\n"


def main() -> int:
    OUT.mkdir(parents=True, exist_ok=True)
    n = 0
    for name in INCLUDE:
        src = REF / name
        if not src.exists():
            print(f"skip (absent in reference): {name}")
            continue
        text = convert(src)
        if text is None:
            print(f"skip (no vendorable names): {name}")
            continue
        (OUT / name).write_text(text)
        n += 1
    print(f"wrote {n} dataset configs -> {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
