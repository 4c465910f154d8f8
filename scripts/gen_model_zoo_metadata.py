#!/usr/bin/env python3
"""Generate machine-readable model-zoo metadata (model-zoo/models.json).

Analog of the reference's ``model-zoo/models.json`` (schemaVersion/updated/
models[]): one entry per detection family in the bundled YAML zoo, with the
family's routed-block class, available scales, measured parameter count
(n-scale build), and the bundled config path. Accuracy fields are left null
until real-dataset evaluations are recorded (offline image — no released
weights to import).

Run from the repo root:  python scripts/gen_model_zoo_metadata.py
"""
from __future__ import annotations

import json
import re
import sys
from datetime import date
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

MODELS_DIR = REPO / "yolo_master_tpu" / "cfg" / "models"
OUT = REPO / "model-zoo" / "models.json"

BLOCK_RE = re.compile(
    r"\b(ES_MOE|[A-Za-z]*MoE[A-Za-z0-9]*|DyC2f|LatentMixture|C2fMoA|C2fMoT|A2C2fMoE|RTDETRDecoder)\b"
)


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import yaml

    from yolo_master_tpu.nn.tasks import DetectionModel

    entries = []
    for f in sorted(MODELS_DIR.glob("*.yaml")):
        stem = f.name[: -len(".yaml")]
        if any(stem.endswith(s) for s in ("-cls", "-seg", "-pose", "-obb", "-semantic")):
            continue  # task variants share the det family's entry
        cfg = yaml.safe_load(f.read_text())
        if "backbone" not in cfg:
            continue
        text = "\n".join(ln.split("#", 1)[0] for ln in f.read_text().splitlines())
        blocks = sorted({b for b in BLOCK_RE.findall(text) if b not in ("nnMoE", "MoE")})
        scales = sorted((cfg.get("scales") or {"n": None}).keys())
        task_variants = sorted(
            g.name[len(stem) + 1 : -len(".yaml")] for g in MODELS_DIR.glob(f"{stem}-*.yaml")
            if g.name[len(stem) + 1 : -len(".yaml")] in ("cls", "seg", "pose", "obb", "semantic")
        )
        try:
            if stem.startswith("rtdetr"):
                from yolo_master_tpu.nn.tasks import RTDETRDetectionModel

                scale = scales[0] if scales and scales[0] else "l"
                m = RTDETRDetectionModel(f"{stem}-{scale}" if "scales" in cfg else stem)
            else:
                m = DetectionModel(f"{stem}-n" if "scales" in cfg else stem)
            n_params = round(m.num_params(m.init_params(0)) / 1e6, 2)
        except Exception as e:  # noqa: BLE001
            n_params = None
            print(f"note: {stem}: params not measured ({type(e).__name__}: {e})")
        entries.append({
            "id": stem,
            "name": stem,
            "family": blocks[0] if blocks else "dense",
            "task": "detect",
            "task_variants": task_variants,
            "scales": scales,
            "blocks": blocks,
            "params_n_M": n_params,
            "map5095": None,
            "config": f"yolo_master_tpu/cfg/models/{f.name}",
        })
    OUT.parent.mkdir(exist_ok=True)
    updated = str(date.today())
    if OUT.exists():  # keep the old stamp when content is unchanged (stable CI diff)
        try:
            old = json.loads(OUT.read_text())
            if old.get("models") == entries:
                updated = old.get("updated", updated)
        except Exception:  # noqa: BLE001
            pass
    OUT.write_text(json.dumps(
        {"schemaVersion": 1, "updated": updated, "models": entries}, indent=1
    ) + "\n")
    print(f"wrote {len(entries)} zoo entries -> {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
