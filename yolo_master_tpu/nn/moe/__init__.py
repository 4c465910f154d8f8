"""ES-MoE family: routed computation blocks (TPU-native rebuild).

Reference: ultralytics/nn/modules/moe/ (10,041 LoC). This package rebuilds the
blocks that matter for the shipped models (SURVEY.md §2.4) with static-shape,
jit-compatible routing: soft top-k (masked renormalized softmax) for training
gradients and hard top-k masked-dense or capacity-bounded gather dispatch for
inference.
"""

from .routers import DynamicRoutingLayer, soft_top_k, hard_top_k
from .experts import DepthwiseSeparableConv, EfficientExpertGroup
from .es_moe import ES_MOE
from .losses import gshard_balance_loss, router_z_loss
from .ultimate import (
    AdaptiveBalanceController,
    AdaptiveCapacityMoE,
    AdvancedRoutingLayer,
    HyperUltimateMoE,
    UltimateOptimizedMoE,
    UltraEfficientRouter,
    UltraOptimizedMoE,
)
from .dynamic import DyC2f, DyMoEBlock, DynamicExpert, MoEGate

__all__ = [
    "DynamicRoutingLayer",
    "soft_top_k",
    "hard_top_k",
    "DepthwiseSeparableConv",
    "EfficientExpertGroup",
    "ES_MOE",
    "gshard_balance_loss",
    "router_z_loss",
    "AdaptiveBalanceController",
    "AdaptiveCapacityMoE",
    "AdvancedRoutingLayer",
    "HyperUltimateMoE",
    "UltimateOptimizedMoE",
    "UltraEfficientRouter",
    "UltraOptimizedMoE",
    "DyC2f",
    "DyMoEBlock",
    "DynamicExpert",
    "MoEGate",
]
