"""Reference-checkpoint importer: torch state_dict -> functional params pytree.

Essential for parity testing against the PyTorch reference (SURVEY.md §7.1):
YOLO-Master ``.pt`` checkpoints (pickled torch module trees, reference
nn/tasks.py:1906 load_checkpoint) convert mechanically because our param tree
mirrors the torch module tree. Only layout transforms are needed:

  * conv weights OIHW -> HWIO (NHWC/TPU layout)
  * linear weights [out, in] -> [in, out]
  * BN: weight->scale, bias->bias, running_mean->mean, running_var->var
  * our "layers" root <-> torch "model" root
  * ES_MOE: torch ``norm.0`` (BN in Sequential) <-> our "norm_bn";
    torch ``routing.routing_network.{0,2}`` 1x1 convs <-> our routing.fc{1,2}
    matrices (squeezed to 2D).

No torch import is required at inference time; this module only needs torch
when actually reading a ``.pt`` file.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

__all__ = ["import_state_dict", "load_reference_checkpoint"]


def _to_numpy(v) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v
    # torch tensor (duck-typed to avoid importing torch unnecessarily)
    return v.detach().cpu().numpy()


# Sequential-index shifts: the reference wraps paramless pooling/flatten
# modules in nn.Sequential (AdaptiveGateMoE family, gated.py); we apply
# pooling functionally, so our child indices start at 0. Keyed by the parent
# segment name; value = torch index offset for the following numeric segment.
_SEQ_SHIFT = {"se_gate": 2, "feature_gate": 1, "refine_gate": 1, "gate_net": 2}
# single-module-on-our-side vs Sequential-on-torch-side (pool + conv)
_WRAPPED = {"complexity_estimator": "1", "context_gate": "0", "ffn_gate": "0"}
# per-parent index remaps where torch interposes paramless Dropout between our
# functional modules (MoT transformer experts: Linear, GELU, Dropout, Linear)
_SEQ_REMAP = {"ffn": {"2": "3"}}


def _torch_key(path: list[str]) -> list[str]:
    """Map our param path to the reference torch state_dict key parts."""
    parts: list[str] = []
    i = 0
    while i < len(path):
        seg = path[i]
        if seg == "layers" and i == 0:
            # only the ROOT container renames (our "layers" <-> torch "model");
            # nested "layers" (e.g. MLP.layers in the RT-DETR decoder heads)
            # keep their torch name verbatim
            parts.append("model")
        elif seg == "norm_bn":
            parts.extend(["norm", "0"])
        elif seg == "fc1" and parts and parts[-1] == "routing":
            # ES_MOE router only (torch routing.routing_network.{0,2});
            # plain fc1/fc2 elsewhere (e.g. AIFI) keep their names
            parts.extend(["routing_network", "0"])
        elif seg == "fc2" and parts and parts[-1] == "routing":
            parts.extend(["routing_network", "2"])
        elif seg in _SEQ_REMAP and i + 1 < len(path) and path[i + 1] in _SEQ_REMAP[seg]:
            parts.append(seg)
            parts.append(_SEQ_REMAP[seg][path[i + 1]])
            i += 1
        elif seg in _SEQ_SHIFT and i + 1 < len(path) and path[i + 1].isdigit():
            parts.append(seg)
            parts.append(str(int(path[i + 1]) + _SEQ_SHIFT[seg]))
            i += 1
        elif seg in _WRAPPED and (i + 1 == len(path) or not path[i + 1].isdigit()):
            parts.extend([seg, _WRAPPED[seg]])
        else:
            parts.append(seg)
        i += 1
    return parts


_LEAF_MAP = {"w": "weight", "b": "bias", "scale": "weight", "bias": "bias", "mean": "running_mean", "var": "running_var"}


def import_state_dict(params: Dict[str, Any], state_dict: Dict[str, Any], strict: bool = True) -> Dict[str, Any]:
    """Fill ``params`` (our tree, used as the structure/shape template) from a
    torch state_dict. Returns a new tree; raises on missing/mismatched keys
    when ``strict``."""
    sd = {k: v for k, v in state_dict.items()}
    used = set()

    def convert(template_leaf: np.ndarray, value: np.ndarray, leaf_name: str, ours: str) -> np.ndarray:
        v = _to_numpy(value).astype(np.float32)
        t_shape = tuple(template_leaf.shape)
        if v.ndim == 4 and len(t_shape) == 4:
            v = v.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        elif v.ndim == 4 and len(t_shape) == 2:
            v = v.reshape(v.shape[0], v.shape[1]).T  # 1x1 conv -> matrix [in, out]
        elif v.ndim == 2 and len(t_shape) == 2 and ours == "w":
            # our "w" 2D leaves are ALWAYS matmul-layout [in, out]; torch
            # nn.Linear stores [out, in]. Transpose unconditionally — the
            # shape-differs heuristic silently skips square matrices (the
            # RT-DETR decoder's value/output projections are square).
            v = v.T
        elif v.ndim == 2 and len(t_shape) == 2 and v.shape != t_shape:
            v = v.T  # linear [out,in] -> [in,out] (non-"w" leaves, by shape)
        if tuple(v.shape) != t_shape and tuple(np.squeeze(v).shape) == t_shape:
            v = np.squeeze(v)  # e.g. layer-scale [C,1,1] -> our flat [C]
        if tuple(v.shape) != t_shape:
            raise ValueError(f"shape mismatch for leaf {leaf_name}: torch {v.shape} vs ours {t_shape}")
        return v

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + [k]) for k, v in node.items()}
        parts = _torch_key(path[:-1])
        leaf = _LEAF_MAP.get(path[-1], path[-1])
        key = ".".join(parts + [leaf])
        if key not in sd:
            if strict:
                raise KeyError(f"missing torch key '{key}' for our path {'.'.join(path)}")
            return node
        used.add(key)
        return convert(node, sd[key], key, path[-1])

    out = walk(params, [])
    if strict:
        leftovers = {
            k
            for k in sd
            if k not in used
            and not k.endswith("num_batches_tracked")
            and ".dfl." not in k  # frozen DFL projection — ours is a pure function
            # DiversifiedExpertGroup records each expert's dilation as a scalar
            # Parameter but the convs use it statically (gated.py:2321-2332) —
            # config echo, not a weight
            and ".dw_dilations." not in k
            # MoT router temperature is a schedule-state buffer (mot/router.py
            # temperature anneal) — ours derives it from ctx.step
            and not k.endswith("router.temperature")
            # UltimateOptimizedMoE's progressive-sparsity counter buffer
            # (modules.py:1575) — ours derives adaptive-k from ctx.step
            and not k.endswith("current_top_k")
            # LatentRouter schedule buffers (latent_mixture.py) — ctx.step-derived here
            and not k.endswith("router._noise_std")
            and not k.endswith("router._temperature")
            # reference CompositeCriterion registers its aux-EMA normalization
            # state as a buffer ON the model once loss() runs (nn/mixture_loss
            # EMA) — train-loop bookkeeping, ours lives in TrainState.aux_ema
            and not k.endswith("_mixture_loss_ema_buf")
        }
        if leftovers:
            raise KeyError(f"unconsumed torch keys: {sorted(leftovers)[:10]} (+{max(len(leftovers)-10,0)} more)")
    return out


def load_reference_checkpoint(params, pt_path: str, strict: bool = True):
    """Load a YOLO-Master .pt (pickle of dict with 'model' or 'ema')."""
    import torch

    ckpt = torch.load(pt_path, map_location="cpu", weights_only=False)
    model = ckpt.get("ema") or ckpt.get("model") if isinstance(ckpt, dict) else ckpt
    sd = model.float().state_dict() if hasattr(model, "state_dict") else model
    return import_state_dict(params, sd, strict=strict)
