#!/usr/bin/env python3
"""PEFT fine-tune: LoRA or MoLoRA adapters, optionally with vPEFT
solver-chosen per-layer ranks.

    python examples/lora_finetune.py --data my.yaml --rank 8
    python examples/lora_finetune.py --data my.yaml --molora
    python examples/lora_finetune.py --data my.yaml --vpeft
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo-root run without install

ap = argparse.ArgumentParser()
ap.add_argument("--data", required=True)
ap.add_argument("--model", default="yolo-master-n")
ap.add_argument("--epochs", type=int, default=50)
ap.add_argument("--rank", type=int, default=8, help="LoRA rank")
ap.add_argument("--molora", action="store_true", help="mixture-of-LoRA adapters")
ap.add_argument("--vpeft", action="store_true", help="vPEFT placement solver picks targets+ranks")
args = ap.parse_args()

from yolo_master_tpu.models.yolo import YOLO

model = YOLO(args.model)
if args.molora:
    peft = {"molora_num_experts": 4, "molora_r": args.rank, "molora_top_k": 2}
elif args.vpeft:
    from yolo_master_tpu.peft.vpeft import solve_placement

    _, plan = solve_placement(model.params, budget=200_000)
    peft = {"lora_r": args.rank, "rank_map": {t.name: t.rank for t in plan.targets}}
else:
    peft = {"lora_r": args.rank}

metrics = model.train(data=args.data, epochs=args.epochs, peft=peft,
                      save_dir="runs/train/peft")
print(metrics)  # adapters fold into deployable weights at train end
