from .lora import (
    LoRAConfig,
    init_lora,
    lora_param_count,
    merge_lora,
    plan_lora_targets,
    save_adapters,
    load_adapters,
)
from .molora import MoLoRAConfig, init_molora, merge_molora

__all__ = [
    "LoRAConfig",
    "init_lora",
    "merge_lora",
    "plan_lora_targets",
    "lora_param_count",
    "save_adapters",
    "load_adapters",
    "MoLoRAConfig",
    "init_molora",
    "merge_molora",
]
