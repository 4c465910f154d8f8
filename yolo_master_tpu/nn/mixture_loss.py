"""Mixture aux-loss composition (reference: ultralytics/nn/mixture_loss.py:13-382
CompositeCriterion).

The reference wraps the task criterion and composes MoE/MoA/MoT/latent aux
losses with per-family gains, EMA magnitude normalization, a global
``mixture_aux_budget``, and isolation of non-finite families. Here the same
composition is a pure function over Context.aux (the registry replacement):
the EMA scales are a [F] array threaded through TrainState (functional state,
no module mutation), and non-finite isolation is a jnp.where — identical on
every data shard by construction.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

FAMILIES = ("moe", "moa", "mot", "latent", "molora", "other")
DEFAULT_EMA_DECAY = 0.9


def family_sums(ctx) -> jnp.ndarray:
    """[F] per-family sums of the aux entries collected during the forward."""
    sums = [jnp.zeros((), jnp.float32) for _ in FAMILIES]
    idx = {f: i for i, f in enumerate(FAMILIES)}
    for path, value in ctx.aux.items():
        fam = ctx.aux_family.get(path, "moe")
        i = idx.get(fam, idx["other"])
        sums[i] = sums[i] + jnp.asarray(value, jnp.float32)
    return jnp.stack(sums)


def compose_aux(
    ctx,
    gains: Dict[str, jnp.ndarray],
    ema: jnp.ndarray,
    budget: float = 0.0,
    ema_decay: float = DEFAULT_EMA_DECAY,
    normalize: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Compose the total aux loss.

    Args:
        gains: per-family gain; families absent default to gains['moe'].
        ema: [F] running magnitude scales (from TrainState.aux_ema).
        budget: cap on the composed total (reference mixture_aux_budget);
            <= 0 disables.
        normalize: scale each family by its EMA magnitude so the gain sets the
            family's effective contribution regardless of raw aux scale.

    Returns (aux_total, new_ema, metrics).
    """
    sums = family_sums(ctx)  # [F]
    finite = jnp.isfinite(sums)
    sums = jnp.where(finite, sums, 0.0)  # non-finite family isolation

    mag = jnp.abs(jax.lax.stop_gradient(sums))
    active = mag > 0
    new_ema = jnp.where(active, ema_decay * ema + (1.0 - ema_decay) * mag, ema)

    base_gain = jnp.asarray(gains.get("moe", 0.01), jnp.float32)
    g = jnp.stack([jnp.asarray(gains.get(f, base_gain), jnp.float32) for f in FAMILIES])
    if normalize:
        scale = jnp.where(active, 1.0 / jnp.maximum(new_ema, 1e-8), 1.0)
        contrib = g * sums * scale
    else:
        contrib = g * sums
    total = jnp.sum(contrib)
    if budget and budget > 0:
        # scale the whole composition down when it exceeds the budget
        factor = jnp.minimum(1.0, budget / jnp.maximum(jnp.abs(total), 1e-12))
        total = total * factor
    metrics = {f"aux_{f}": contrib[i] for i, f in enumerate(FAMILIES) if f != "other"}
    metrics["aux_isolated"] = jnp.sum(~finite).astype(jnp.float32)
    return total, new_ema, metrics


def init_aux_ema() -> jnp.ndarray:
    return jnp.ones((len(FAMILIES),), jnp.float32)
