"""Checkpoint IO (reference: .pt pickle dicts, engine/trainer.py:881-891 save_model).

Native format: orbax for full train state (params/ema/opt_state/step — resume),
plus a flat .npz for params-only publishing (the strip_optimizer analog,
reference utils/torch_utils.py:762).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np


_EMPTY = "__empty__"  # sentinel leaf marking a parameterless subtree


def flatten_tree(tree, prefix: str = "") -> Dict[str, np.ndarray]:
    if not isinstance(tree, dict):
        return {prefix[:-1]: np.asarray(tree)}
    if not tree:
        # parameterless modules (Concat/Upsample layers) own empty dicts; they
        # must survive the roundtrip or model walkers KeyError on the layer
        return {f"{prefix}{_EMPTY}": np.zeros((), np.int8)} if prefix else {}
    flat: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        flat.update(flatten_tree(v, f"{prefix}{k}."))
    return flat


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, val in flat.items():
        node = tree
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        if parts[-1] == _EMPTY:
            continue  # the setdefault chain already materialized the empty dict
        node[parts[-1]] = val
    return tree


def save_params_npz(params, path: str, metadata: Optional[Dict[str, str]] = None) -> str:
    """Params-only portable checkpoint (.npz with dotted keys)."""
    flat = flatten_tree(params)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    meta = {f"__meta__.{k}": np.asarray(v) for k, v in (metadata or {}).items()}
    np.savez(path, **flat, **meta)
    return str(path)


def load_params_npz(path: str):
    data = np.load(path, allow_pickle=False)
    flat = {k: data[k] for k in data.files if not k.startswith("__meta__.")}
    import jax.numpy as jnp

    return jax.tree_util.tree_map(jnp.asarray, unflatten_tree(flat))


def save_train_state(state, path: str) -> str:
    """Full resume checkpoint via orbax."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(str(path), jax.device_get(state), force=True)
    return str(path)


def load_train_state(path: str, template):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(str(Path(path).absolute()), item=jax.device_get(template))
    return jax.tree_util.tree_map(lambda t, r: r, template, restored)
