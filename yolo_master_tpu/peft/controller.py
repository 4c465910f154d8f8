"""Adapter runtime controller: LoRA/MoLoRA lifecycle inside the trainer
(reference: ultralytics/engine/extensions/adapters.py:68 AdapterRuntimeController,
:50 validate_adapter_configuration).

TPU-native form: instead of mutating torch modules in place, training runs on
a combined pytree ``{"base": frozen, "adapters": trainable}``; a thin wrapper
model merges adapters into the base inside the jitted step (the base is
stop_gradient'ed by merge_lora, and the optimizer additionally zeroes base
updates via optax.multi_transform so momentum never accumulates there).
At train end adapters are folded into plain weights and saved separately.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import optax

from ..utils import LOGGER
from .lora import LoRAConfig, fold_lora, init_lora, lora_param_count, merge_lora, save_adapters, scale_map
from .molora import MoLoRAConfig, init_molora, merge_molora


class PEFTWrappedModel:
    """Delegates everything to the base model, merging adapters on forward."""

    def __init__(self, base_model, merge_fn):
        self._base = base_model
        self._merge = merge_fn

    def __getattr__(self, name):
        return getattr(self._base, name)

    def forward_train(self, p, x, ctx):
        merged = self._merge(p, train=ctx.training)
        out = self._base.forward_train(merged, x, ctx)
        if ctx.updates:
            # BN running-stat paths are relative to the plain model; reroot
            # them under "base" so apply_updates walks the combined tree
            ctx.updates = {k if k.startswith("base.") else f"base.{k}": v
                           for k, v in ctx.updates.items()}
        return out

    def forward_predict(self, p, x, ctx=None):
        return self._base.forward_predict(self._merge(p, train=False), x, ctx)


class AdapterController:
    """Owns adapter construction, the frozen-base optimizer policy, and the
    end-of-train fold (reference AdapterRuntimeController.setup/
    configure_optimizer/finalize)."""

    def __init__(self, lora_r: int = 0, lora_alpha: float = 16.0, lora_targets=None,
                 molora_num_experts: int = 0, molora_r: int = 4, molora_top_k: int = 2,
                 rank_map: Optional[Dict[str, int]] = None, seed: int = 0):
        # mutually exclusive, like the reference's validate_adapter_configuration
        if lora_r > 0 and molora_num_experts > 0:
            raise ValueError(
                "Standard LoRA and MoLoRA cannot be enabled in the same training run. "
                "Set lora_r=0 or molora_num_experts=0."
            )
        self.kind = "lora" if lora_r > 0 else "molora" if molora_num_experts > 0 else None
        self.lora_cfg = LoRAConfig(r=max(lora_r, 1), alpha=lora_alpha, seed=seed,
                                   targets=tuple(lora_targets or ())) if self.kind == "lora" else None
        self.molora_cfg = MoLoRAConfig(r=molora_r, num_experts=molora_num_experts,
                                       top_k=molora_top_k, seed=seed) if self.kind == "molora" else None
        self.rank_map = rank_map
        self.adapters_template = None
        self._scale = None

    @property
    def enabled(self) -> bool:
        return self.kind is not None

    # -- setup -----------------------------------------------------------------
    def attach(self, model, params):
        """-> (wrapped_model, combined_params {"base","adapters"})."""
        assert self.enabled
        if self.kind == "lora":
            adapters = init_lora(params, self.lora_cfg, rank_map=self.rank_map)
            self._scale = scale_map(adapters, self.lora_cfg.alpha)

            def merge(p, train=True):
                return merge_lora(p["base"], p["adapters"], self._scale, train=train)
        else:
            adapters = init_molora(params, self.molora_cfg)

            def merge(p, train=True):
                merged, _aux = merge_molora(p["base"], p["adapters"], self.molora_cfg, train=train)
                return merged
        self.adapters_template = adapters
        n = lora_param_count(adapters)
        total = sum(x.size for x in jax.tree_util.tree_leaves(params))
        LOGGER.info(f"{self.kind}: {len(adapters)} targets, {n:,} trainable of {total:,} params "
                    f"({100 * n / total:.2f}%)")
        return PEFTWrappedModel(model, merge), {"base": params, "adapters": adapters}

    # -- optimizer policy --------------------------------------------------------
    def wrap_optimizer(self, tx: optax.GradientTransformation) -> optax.GradientTransformation:
        """Zero base updates so the frozen tree never drifts (momentum, wd)."""

        def labels(params):
            return {
                "base": jax.tree_util.tree_map(lambda _: "freeze", params["base"]),
                "adapters": jax.tree_util.tree_map(lambda _: "train", params["adapters"]),
            }

        return optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()}, labels)

    # -- teardown ----------------------------------------------------------------
    def fold(self, combined, save_dir: Optional[str] = None):
        """Bake adapters into deployable plain weights; optionally save the
        adapter tree on its own (reference strip/publish flow)."""
        if save_dir is not None:
            save_adapters(combined["adapters"], f"{save_dir}/adapters.npz",
                          meta={"kind": self.kind})
        if self.kind == "lora":
            return fold_lora(combined["base"], combined["adapters"], self._scale)
        merged, _ = merge_molora(combined["base"], combined["adapters"], self.molora_cfg, train=False)
        return merged
