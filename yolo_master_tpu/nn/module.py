"""Minimal functional module framework for the TPU-native YOLO-Master rebuild.

Design goals (vs. torch ``nn.Module`` in the reference):

* Parameters live in an explicit nested-dict pytree, fully separate from module
  objects. Modules are *static* graph descriptions (config + children); they are
  hashable-by-identity and safe to close over inside ``jax.jit``.
* Mutable-state side channels of the reference (BatchNorm running stats updated
  in-place, the global MoE aux-loss registry ``moe/_common.py``) are replaced by
  a trace-time :class:`Context` that *collects* updates/aux values during the
  forward trace. The caller threads them out as explicit jit outputs — the
  JAX-idiomatic replacement for ``MOE_LOSS_REGISTRY``
  (reference: ultralytics/nn/modules/routing_protocol.py:57-175).
* Parameter naming mirrors the torch module tree (``cv1.conv.w`` ...) so that
  importing reference ``.pt`` checkpoints is a mechanical tree walk
  (see utils/torch_import.py).

Everything here is plain Python + jax.numpy; no flax dependency, so model
surgery (MoE pruning, LoRA injection, BN folding) is ordinary dict surgery.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclass
class Context:
    """Per-forward-trace context threaded through every module call.

    Replaces the reference's implicit channels:
      * ``training``  — torch ``module.training`` flag.
      * ``updates``   — BatchNorm running-stat writes (torch: in-place buffer
        mutation). Keyed by module path; merged into the state tree by the
        caller via :func:`apply_updates`.
      * ``aux``       — MoE/MoA/MoT auxiliary losses (torch: global registry,
        ultralytics/nn/modules/moe/_common.py). Keyed by module path.
      * ``stats``     — routing snapshots / diagnostics (host-viewable traced
        values; harmless to ignore under jit).
    """

    training: bool = False
    compute_dtype: Optional[jnp.dtype] = None
    # global step (traced ok) — drives progressive sparsity / expert dropout /
    # temperature schedules in routed modules (reference schedulers)
    step: Any = 0
    aux: Dict[str, jnp.ndarray] = field(default_factory=dict)
    updates: Dict[str, Any] = field(default_factory=dict)
    stats: Dict[str, Any] = field(default_factory=dict)
    # When True, routed modules use hard top-k sparse weights in eval
    # (reference: ES_MOE._eager_sparse_enabled, moe/modules.py:575-583).
    sparse_inference: bool = True
    # mixture family per aux entry (moe/moa/mot/latent/molora) — drives the
    # per-family gain + normalization composition (reference nn/mixture_loss.py)
    aux_family: Dict[str, str] = field(default_factory=dict)
    # ground-truth batch, stashed by the train step for models whose FORWARD
    # needs labels (RT-DETR contrastive denoising, reference get_cdn_group)
    gt: Any = None
    # Expert parallelism (TPU-native addition; the reference replicates experts
    # per rank, SURVEY.md §2.7): when set, routed blocks stack their expert
    # params into [E, ...] banks constrained to this mesh axis so XLA
    # partitions expert compute over it and reduces the mixture over ICI.
    expert_axis: Optional[str] = None
    mesh: Any = None

    def add_aux(self, path: str, value: jnp.ndarray, family: str = "moe") -> None:
        self.aux[path] = self.aux.get(path, 0.0) + value
        self.aux_family[path] = family

    def total_aux(self) -> jnp.ndarray:
        if not self.aux:
            return jnp.zeros(())
        return sum(jnp.asarray(v, jnp.float32) for v in self.aux.values())


class Module:
    """Base class: static config holder + child registry.

    Subclasses implement ``init(key) -> Params`` and ``__call__(p, x, ctx)``.
    Child modules assigned as attributes (or inside :class:`ModuleList`) are
    auto-registered; the default ``init`` recursively initializes them under
    their attribute names, producing a params tree that mirrors the reference's
    torch module tree.
    """

    def __init__(self):
        object.__setattr__(self, "_children", {})
        object.__setattr__(self, "path", "")

    def __setattr__(self, name: str, value: Any) -> None:
        ch = self.__dict__.get("_children")
        if ch is not None:
            if isinstance(value, (Module, ModuleList)):
                ch[name] = value
            elif name in ch:
                del ch[name]
        object.__setattr__(self, name, value)

    def __delattr__(self, name: str) -> None:
        ch = self.__dict__.get("_children")
        if ch is not None and name in ch:
            del ch[name]
        object.__delattr__(self, name)

    # ---- init ------------------------------------------------------------
    def init(self, key: jax.Array) -> Params:
        """Default init: recursively init registered children."""
        params: Params = {}
        children = list(self._children.items())
        keys = jax.random.split(key, max(len(children), 1))
        for (name, child), k in zip(children, keys):
            params[name] = child.init(k)
        return params

    # ---- path assignment (enables aux/update keying) ----------------------
    def finalize(self, path: str = "") -> "Module":
        object.__setattr__(self, "path", path)
        for name, child in self._children.items():
            child.finalize(f"{path}.{name}" if path else name)
        return self

    def __call__(self, p: Params, x, ctx: Context):  # pragma: no cover - abstract
        raise NotImplementedError


class ModuleList:
    """Ordered list of modules; params stored under string indices "0","1",..."""

    def __init__(self, mods: Optional[List[Module]] = None):
        self.mods: List[Module] = list(mods or [])

    def __iter__(self):
        return iter(self.mods)

    def __len__(self):
        return len(self.mods)

    def __getitem__(self, i):
        return self.mods[i]

    def append(self, m: Module):
        self.mods.append(m)

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, max(len(self.mods), 1))
        return {str(i): m.init(k) for i, (m, k) in enumerate(zip(self.mods, keys))}

    def finalize(self, path: str = ""):
        for i, m in enumerate(self.mods):
            m.finalize(f"{path}.{i}" if path else str(i))
        return self


def apply_updates(params: Params, updates: Dict[str, Any]) -> Params:
    """Merge Context.updates (path -> {leafname: value}) into the params tree.

    The functional analog of torch BatchNorm's in-place running-stat mutation.
    """
    if not updates:
        return params
    params = dict_copy(params)
    for path, leaf_updates in updates.items():
        node = params
        parts = path.split(".")
        for p in parts:
            node = node[p]
        for k, v in leaf_updates.items():
            node[k] = v
    return params


def dict_copy(d):
    """Shallow-copy every dict level of a nested dict tree (leaves shared)."""
    if isinstance(d, dict):
        return {k: dict_copy(v) for k, v in d.items()}
    return d


# ---------------------------------------------------------------------------
# Initializers matching torch defaults (for checkpoint-free parity of scale)
# ---------------------------------------------------------------------------

def kaiming_uniform_conv(key, shape):
    """torch nn.Conv2d default: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), ...).

    shape is HWIO; fan_in = H*W*I (per-group input channels already divided).
    """
    fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def conv_bias_uniform(key, fan_in, size):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, (size,), jnp.float32, -bound, bound)


def trunc_normal(key, shape, std=0.02):
    """Truncated normal in (-2std, 2std), matching torch nn.init.trunc_normal_."""
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32)
