"""MoE auxiliary losses (reference: ultralytics/nn/modules/moe/loss.py).

All functions are pure; cross-rank reduction of usage is the caller's job via
``jax.lax.pmean`` over the data axis inside the jitted step — the single-program
analog of the reference's ``all_reduce_mean`` (loss.py:164-200).
"""

from __future__ import annotations

import jax.numpy as jnp


def gshard_balance_loss(expert_usage: jnp.ndarray, num_experts: int) -> jnp.ndarray:
    """GShard-scale balance loss: ``E * sum(p_e^2)`` over normalized usage.

    Equals 1.0 at perfectly uniform usage (reference moe/loss.py:15-26).
    """
    usage = expert_usage.reshape(-1).astype(jnp.float32)
    usage = usage / jnp.clip(jnp.sum(usage), 1e-9, None)
    return num_experts * jnp.sum(usage * usage)


def router_z_loss(logits: jnp.ndarray) -> jnp.ndarray:
    """z-loss: mean of logsumexp(logits)^2 over tokens — keeps router logits small
    (reference moe/loss.py z-loss term in MoELoss:94-200)."""
    lse = jnp.log(jnp.sum(jnp.exp(logits.astype(jnp.float32)), axis=-1))
    return jnp.mean(lse**2)
