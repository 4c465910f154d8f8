"""Generate the generation YAML zoo (VERDICT r2 item 8).

Reference layout: cfg/models/master/{v0_2..v0_15}/{det,seg,pose,obb,cls}/
yolo-master-*.yaml — every generation shares one graph; only the routed MoE
block (and its arg list) differs (verified by diffing the reference YAMLs).
Scale rows (n/s/m/l/x) are encoded in one `scales:` dict per file — our
parse_model applies compound depth/width exactly like the reference, so each
file covers all five scale variants, gated by tests/test_model_configs.py.

Run from the repo root:  python scripts/gen_yaml_zoo.py
"""

from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "yolo_master_tpu" / "cfg" / "models"

# generation -> (block name, MoE arg suffix after channels)
# channels per site are 512 / 512 / 1024 like v0_10; reference args are
# [c, num_experts(4/8/16), top_k=2(, split_ratio=0.5)]
GENERATIONS = {
    "v0_2": ("UltraOptimizedMoE", ""),            # exp/yolo-master-v0_2.yaml
    "v0_4": ("AdaptiveGateMoE", ", 0.5"),
    "v0_5": ("FusedAdaptiveGateMoE", ", 0.5"),
    "v0_6": ("HybridAdaptiveGateMoE", ", 0.5"),
    "v0_7": ("LowRankHybridAdaptiveGateMoE", ", 0.5"),
    "v0_8": ("RefinedLowRankHybridAdaptiveGateMoE", ", 0.5"),
    "v0_9": ("DetailAwareLowRankHybridAdaptiveGateMoE", ", 0.5"),
    "v0_11": ("HybridAdaptiveGateMoEv2", ", 0.5"),
    "v0_12": ("OptimalHybridGateMoE", ", 0.5"),
    "v0_13": ("MultiHeadRouterMoE", ", 0.5"),
    "v0_14": ("DiversifiedExpertMoE", ", 0.5"),
    "v0_15": ("GatedFusionMoE", ", 0.5"),
}

HEADS = {
    "det": "  - [[17, 20, 23], 1, Detect, [nc]]        # 24",
    "seg": "  - [[17, 20, 23], 1, Segment, [nc, 32, 256]]   # 24",
    "pose": "  - [[17, 20, 23], 1, Pose, [nc, [17, 3]]]      # 24",
    "obb": "  - [[17, 20, 23], 1, OBB, [nc, 1]]             # 24",
}

TEMPLATE = """# YOLO-Master {gen} — generated generation variant (scripts/gen_yaml_zoo.py).
# Graph parity: reference cfg/models/master/{gen}/det/yolo-master-n.yaml
# (same topology as v0_10; routed block = {block}).
# MoE args: c2, num_experts, top_k{argnote}

nc: 80
{kpt}scales:
  n: [0.50, 0.25, 1024]
  s: [0.50, 0.50, 1024]
  m: [0.50, 1.00, 512]
  l: [1.00, 1.00, 512]
  x: [1.00, 1.50, 512]

backbone:
  - [-1, 1, Conv, [64, 3, 2]]            # 0  P1/2
  - [-1, 1, Conv, [128, 3, 2]]           # 1  P2/4
  - [-1, 2, C3k2, [256, False, 0.25]]    # 2
  - [-1, 1, Conv, [256, 3, 2]]           # 3  P3/8
  - [-1, 2, C3k2, [512, False, 0.25]]    # 4
  - [-1, 1, {block}, [512, 4, 2{args}]]    # 5
  - [-1, 1, Conv, [512, 3, 2]]           # 6  P4/16
  - [-1, 4, A2C2f, [512, True, 4]]       # 7
  - [-1, 1, {block}, [512, 8, 2{args}]]    # 8
  - [-1, 1, Conv, [1024, 3, 2]]          # 9  P5/32
  - [-1, 4, A2C2f, [1024, True, 1]]      # 10
  - [-1, 1, {block}, [1024, 16, 2{args}]]  # 11

head:
  - [-1, 1, Upsample, [None, 2, nearest]]  # 12
  - [[-1, 8], 1, Concat, [1]]              # 13
  - [-1, 2, C3k2, [512, True]]             # 14
  - [-1, 1, Upsample, [None, 2, nearest]]  # 15
  - [[-1, 5], 1, Concat, [1]]              # 16
  - [-1, 2, C3k2, [256, True]]             # 17  P3
  - [-1, 1, Conv, [256, 3, 2]]             # 18
  - [[-1, 14], 1, Concat, [1]]             # 19
  - [-1, 2, C3k2, [512, True]]             # 20  P4
  - [-1, 1, Conv, [512, 3, 2]]             # 21
  - [[-1, 11], 1, Concat, [1]]             # 22
  - [-1, 2, C3k2, [512, True]]             # 23  P5
{head}
"""


CLS_TEMPLATE = """# YOLO-Master {gen} classification — generated (scripts/gen_yaml_zoo.py).
# Graph parity: reference cfg/models/master/{gen}/cls/yolo-master-n.yaml
# (MoE backbone + Classify head; reference keeps nc=1000 ImageNet default).

nc: 1000
scales:
  n: [0.50, 0.25, 1024]
  s: [0.50, 0.50, 1024]
  m: [0.50, 1.00, 512]
  l: [1.00, 1.00, 512]
  x: [1.00, 1.50, 512]

backbone:
  - [-1, 1, Conv, [64, 3, 2]]            # 0  P1/2
  - [-1, 1, Conv, [128, 3, 2]]           # 1  P2/4
  - [-1, 2, C3k2, [256, False, 0.25]]    # 2
  - [-1, 1, Conv, [256, 3, 2]]           # 3  P3/8
  - [-1, 2, C3k2, [512, False, 0.25]]    # 4
  - [-1, 1, {block}, [512, 4, 2{args}]]    # 5
  - [-1, 1, Conv, [512, 3, 2]]           # 6  P4/16
  - [-1, 4, A2C2f, [512, True, 4]]       # 7
  - [-1, 1, {block}, [512, 8, 2{args}]]    # 8
  - [-1, 1, Conv, [1024, 3, 2]]          # 9  P5/32
  - [-1, 4, A2C2f, [1024, True, 1]]      # 10
  - [-1, 1, {block}, [1024, 16, 2{args}]]  # 11

head:
  - [-1, 1, Classify, [nc]]              # 12
"""

# generations with per-task reference files (cfg/models/master/<gen>/{seg,...})
TASK_GENERATIONS = {
    **GENERATIONS,
    "v0_10": ("VisualEnhancedAdaptiveGateMoE", ", 0.5"),
}


def main():
    written = []
    for gen, (block, args) in GENERATIONS.items():
        text = TEMPLATE.format(gen=gen, block=block, args=args, kpt="",
                               argnote=args and ", split_ratio" or "",
                               head=HEADS["det"])
        path = OUT / f"yolo-master-{gen}.yaml"
        path.write_text(text)
        written.append(path.name)
    # per-generation task variants (reference cfg/models/master/<gen>/{seg,
    # pose,obb,cls}/ — every generation ships the full task spread)
    for gen, (block, args) in TASK_GENERATIONS.items():
        for task in ("seg", "pose", "obb"):
            kpt = "kpt_shape: [17, 3]\n" if task == "pose" else ""
            text = TEMPLATE.format(gen=gen, block=block, args=args, kpt=kpt,
                                   argnote=args and ", split_ratio" or "",
                                   head=HEADS[task])
            path = OUT / f"yolo-master-{gen}-{task}.yaml"
            path.write_text(text)
            written.append(path.name)
        text = CLS_TEMPLATE.format(gen=gen, block=block, args=args)
        path = OUT / f"yolo-master-{gen}-cls.yaml"
        path.write_text(text)
        written.append(path.name)
    print(f"wrote {len(written)} YAMLs:", ", ".join(written))


if __name__ == "__main__":
    main()
