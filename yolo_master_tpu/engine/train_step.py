"""Jitted training step: forward + v8 loss + TAL + MoE aux, grad, EMA.

The functional analog of the reference hot loop (engine/trainer.py:627-730):
one pure function replaces autocast/GradScaler (bf16 needs no loss scaling),
in-place optimizer/EMA mutation (pytree updates), the global MoE registry
(Context aux), and DDP all-reduce (XLA collectives from sharded batch).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..nn.losses import composite_loss
from ..nn.module import Context, apply_updates


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    ema_params: Any
    step: jnp.ndarray  # int32 scalar
    ema_updates: jnp.ndarray  # EMA update counter (reference ModelEMA.updates)


def weight_decay_mask(params):
    """Decay only >=2D 'w' leaves (conv/linear weights) — the reference's
    3-group optimizer split (trainer builds g0=weights w/ decay, g1=bn, g2=bias;
    engine/trainer.py build_optimizer)."""

    def walk(node, name=""):
        if isinstance(node, dict):
            return {k: walk(v, k) for k, v in node.items()}
        return name == "w" and getattr(node, "ndim", 0) >= 2

    return walk(params)


def make_optimizer(lr_schedule, momentum: float = 0.937, weight_decay: float = 5e-4, clip_norm: float = 10.0, params=None):
    """SGD+nesterov with decoupled-style weight decay on conv weights only and
    global-norm clipping at 10.0 (reference trainer optimizer_step clip,
    trainer.py:959)."""
    txs = [optax.clip_by_global_norm(clip_norm)]
    if weight_decay and params is not None:
        txs.append(optax.add_decayed_weights(weight_decay, mask=weight_decay_mask(params)))
    txs.append(optax.sgd(lr_schedule, momentum=momentum, nesterov=True))
    return optax.chain(*txs)


def make_train_state(model, seed: int = 0, lr=0.01, tx: Optional[optax.GradientTransformation] = None) -> TrainState:
    params = model.init_params(seed)
    if tx is None:
        tx = make_optimizer(lr, params=params)
    opt_state = tx.init(params)
    # ema must be a distinct buffer set (the step donates its input state)
    ema = jax.tree_util.tree_map(jnp.copy, params)
    return TrainState(params, opt_state, ema, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.float32))


def ema_decay(updates: jnp.ndarray, decay: float = 0.9999, tau: float = 2000.0):
    """Ramped EMA decay (reference utils/torch_utils.py:695 ModelEMA)."""
    return decay * (1.0 - jnp.exp(-updates / tau))


def make_train_step(
    model,
    tx: Optional[optax.GradientTransformation] = None,
    mesh=None,
    imgsz: int = 640,
    batch_per_step: int = 16,
    max_gt: int = 128,
    hyp: Optional[Dict[str, float]] = None,
    compute_dtype=jnp.float32,
    ema_on: bool = True,
    accumulate: int = 1,
):
    """Build the jitted (optionally mesh-sharded) train step.

    batch dict: images [B,H,W,3] float, boxes [B,M,4] xyxy px, classes [B,M],
    mask [B,M] bool. Under a mesh, the batch axis is sharded over 'data' and
    params are replicated; XLA inserts all gradient/BN/aux collectives.
    """
    hyp = {"box": 7.5, "cls": 0.5, "dfl": 1.5, "moe": 0.01, **(hyp or {})}
    if tx is None:
        tx = make_optimizer(0.01)

    def loss_fn(params, batch, step_idx):
        ctx = Context(training=True, compute_dtype=compute_dtype, step=step_idx)
        x = batch["images"].astype(compute_dtype)
        preds = model.forward_train(params, x, ctx)
        total, metrics = model.compute_loss(preds, batch, ctx.total_aux(), hyp)
        return total, (metrics, ctx.updates)

    def grad_fn(params, batch, step_idx):
        """Gradients, optionally accumulated over micro-batches (the functional
        analog of the reference's nbs grad accumulation, trainer.py:649-666)."""
        if accumulate <= 1:
            return jax.value_and_grad(loss_fn, has_aux=True)(params, batch, step_idx)
        micro = jax.tree_util.tree_map(
            lambda a: a.reshape(accumulate, a.shape[0] // accumulate, *a.shape[1:]), batch
        )

        def scan_body(carry, mb):
            acc_grads, acc_total, acc_metrics = carry
            (total, (metrics, updates)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, mb, step_idx)
            acc_grads = jax.tree_util.tree_map(lambda a, g: a + g, acc_grads, grads)
            acc_metrics = jax.tree_util.tree_map(lambda a, m: a + m, acc_metrics, metrics) if acc_metrics else metrics
            return (acc_grads, acc_total + total, acc_metrics), updates

        first_mb = jax.tree_util.tree_map(lambda a: a[0], micro)
        (total0, (metrics0, updates0)), grads0 = jax.value_and_grad(loss_fn, has_aux=True)(params, first_mb, step_idx)
        carry = (grads0, total0, metrics0)
        for i in range(1, accumulate):
            mb = jax.tree_util.tree_map(lambda a: a[i], micro)
            carry, updates0 = scan_body(carry, mb)
        grads, total, metrics = carry
        k = float(accumulate)
        grads = jax.tree_util.tree_map(lambda g: g / k, grads)
        metrics = jax.tree_util.tree_map(lambda m: m / k, metrics)
        return (total / k, (metrics, updates0)), grads

    def step(state: TrainState, batch):
        (total, (loss_metrics, bn_updates)), grads = grad_fn(state.params, batch, state.step)
        # non-finite guard: skip the update on NaN/Inf loss (functional analog
        # of the reference's coordinated NaN recovery, trainer.py:1026,1392)
        finite = jnp.isfinite(total)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = apply_updates(params, bn_updates)
        params = jax.tree_util.tree_map(lambda new, old: jnp.where(finite, new, old), params, state.params)
        opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old) if hasattr(new, "shape") and new.shape == getattr(old, "shape", None) else new,
            opt_state,
            state.opt_state,
        )
        if ema_on:
            n_updates = state.ema_updates + finite.astype(jnp.float32)
            d = ema_decay(n_updates)
            ema = jax.tree_util.tree_map(lambda e, p: d * e + (1.0 - d) * p, state.ema_params, params)
        else:
            n_updates = state.ema_updates
            ema = state.ema_params
        new_state = TrainState(params, opt_state, ema, state.step + 1, n_updates)
        metrics = dict(loss_metrics)
        metrics["finite"] = finite.astype(jnp.float32)
        return new_state, metrics

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))  # applies to every batch leaf
        return jax.jit(step, in_shardings=(repl, data), out_shardings=(repl, repl), donate_argnums=(0,))
    return jax.jit(step, donate_argnums=(0,))
