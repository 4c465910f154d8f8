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
    # [F] per-mixture-family aux magnitude EMAs (reference CompositeCriterion
    # EMA normalization, nn/mixture_loss.py) — None disables composition
    aux_ema: Any = None


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


def param_group_labels(params):
    """Reference optimizer policy split (engine/trainer.py:1484-1528
    build_optimizer): router params ("router"/"routing" anywhere in the
    qualified name) get their own group (decayed, lr x moe_router_lr_scale,
    checked BEFORE the bias rule — router biases are router-group); then
    g2 = biases (no decay, own warmup LR starting at warmup_bias_lr),
    g0 = >=2D weights (decayed), g1 = norm scales / other (no decay)."""

    def walk(node, name="", in_router=False):
        if isinstance(node, dict):
            return {
                k: walk(v, k, in_router or "router" in k.lower() or "routing" in k.lower())
                for k, v in node.items()
            }
        if in_router or "router" in name.lower() or "routing" in name.lower():
            return "router"
        if name == "w" and getattr(node, "ndim", 0) >= 2:
            return "decay"
        if name in ("b", "bias"):
            return "bias"
        return "other"

    return walk(params)


def resolve_auto_optimizer(nc: int, iterations: float, lr0: float, momentum: float):
    """'optimizer: auto' resolution (reference trainer.py build_optimizer):
    short runs get AdamW with an nc-scaled LR, long runs SGD."""
    if iterations > 10000:
        return "SGD", lr0, momentum
    return "AdamW", round(0.002 * 5 / (4 + nc), 6), 0.9


def build_optimizer(
    name: str,
    lr_fn,
    params,
    momentum: float = 0.937,
    weight_decay: float = 5e-4,
    clip_norm: float = 10.0,
    momentum_fn=None,
    bias_lr_fn=None,
    router_lr_scale: float = 0.5,
) -> optax.GradientTransformation:
    """Full reference-parity optimizer: per-group LRs (bias warmup, router
    lr x moe_router_lr_scale), momentum warmup schedule, coupled weight decay
    on conv/linear weights + router params (the reference's g0/g1/g2/router
    policy, trainer.py:1484-1528), global-norm clip 10.0.
    ``name``: SGD | AdamW | Adam | RMSProp | Muon | MuSGD.
    """
    name = name.lower()
    momentum_fn = momentum_fn or (lambda s: momentum)
    bias_lr_fn = bias_lr_fn or lr_fn
    router_lr_fn = (lambda s: router_lr_scale * lr_fn(s)) if callable(lr_fn) else router_lr_scale * lr_fn

    def base(lr):
        if name == "sgd":
            return optax.inject_hyperparams(optax.sgd)(learning_rate=lr, momentum=momentum_fn, nesterov=True)
        if name == "adamw" or name == "adam":
            return optax.adam(lr, b1=momentum if momentum < 1 else 0.9)
        if name == "rmsprop":
            return optax.rmsprop(lr, momentum=momentum)
        if name in ("muon", "musgd"):
            from ..optim import muon

            return optax.chain(muon(1.0, momentum=momentum), optax.scale_by_schedule(lambda c: lr(c) if callable(lr) else lr))
        raise ValueError(f"unknown optimizer '{name}'")

    labels = param_group_labels(params)
    tx = optax.multi_transform(
        {
            "decay": optax.chain(optax.add_decayed_weights(weight_decay), base(lr_fn)),
            "other": base(lr_fn),
            "bias": base(bias_lr_fn),
            "router": optax.chain(optax.add_decayed_weights(weight_decay), base(router_lr_fn)),
        },
        labels,
    )
    return optax.chain(optax.clip_by_global_norm(clip_norm), tx)


def make_train_state(model, seed: int = 0, lr=0.01, tx: Optional[optax.GradientTransformation] = None) -> TrainState:
    params = model.init_params(seed)
    if tx is None:
        tx = make_optimizer(lr, params=params)
    opt_state = tx.init(params)
    # ema must be a distinct buffer set (the step donates its input state)
    ema = jax.tree_util.tree_map(jnp.copy, params)
    from ..nn.mixture_loss import init_aux_ema

    return TrainState(params, opt_state, ema, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.float32), init_aux_ema())


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
    return_stats: bool = False,
    traced_moe_gain: bool = False,
    expert_axis: Optional[str] = None,
    jit_compile: bool = True,
    remat: bool = False,
):
    """Build the jitted (optionally mesh-sharded) train step.

    batch dict: images [B,H,W,3] float, boxes [B,M,4] xyxy px, classes [B,M],
    mask [B,M] bool. Under a mesh, the batch axis is sharded over 'data' and
    params are replicated; XLA inserts all gradient/BN/aux collectives.

    With ``traced_moe_gain`` the step takes a third scalar arg overriding
    hyp['moe'] — the epoch-level Gini/mAP-saturation schedulers adjust it
    without recompiling (reference MixtureRuntimeController).
    With ``return_stats`` the metrics include a ``moe_stats`` subtree of
    per-block routing snapshots (Context.stats) for the usage tracker /
    collapse detector / routing history.
    With ``expert_axis`` (a second mesh axis name, e.g. 'expert'), routed
    blocks shard their stacked [E, ...] expert banks over that axis — real
    expert parallelism of the model's own experts (the reference replicates
    experts per rank; SURVEY.md §2.7 names EP as the TPU-native addition).
    """
    hyp = {"box": 7.5, "cls": 0.5, "dfl": 1.5, "moe": 0.01, **(hyp or {})}
    if tx is None:
        tx = make_optimizer(0.01)

    def loss_fn(params, batch, step_idx, moe_gain=None, aux_ema=None):
        ctx = Context(
            training=True, compute_dtype=compute_dtype, step=step_idx, gt=batch,
            expert_axis=expert_axis, mesh=mesh if expert_axis else None,
        )
        x = batch["images"].astype(compute_dtype)
        h = hyp if moe_gain is None else {**hyp, "moe": moe_gain}
        preds = model.forward_train(params, x, ctx)
        if aux_ema is not None and ctx.aux:
            # per-family composition (reference CompositeCriterion):
            # gains + EMA normalization + budget + non-finite isolation
            from ..nn.mixture_loss import compose_aux

            gains = {f: h[f] for f in ("moe", "moa", "mot", "latent", "molora") if f in h}
            aux_total, new_ema, aux_metrics = compose_aux(
                ctx, gains, aux_ema, budget=h.get("mixture_aux_budget", 0.0),
                normalize=bool(h.get("mixture_aux_normalize", True)),
            )
            base, metrics = model.compute_loss(preds, batch, jnp.zeros(()), {**h, "moe": 0.0})
            total = base + aux_total
            metrics = dict(metrics)
            metrics.update(aux_metrics)
            metrics["aux_loss"] = aux_total
            metrics["loss"] = total
        else:
            new_ema = aux_ema
            total, metrics = model.compute_loss(preds, batch, ctx.total_aux(), h)
        if return_stats:
            metrics = dict(metrics)
            metrics["moe_stats"] = ctx.stats
        return total, (metrics, ctx.updates, new_ema)

    # remat: recompute forward activations during the backward pass instead of
    # storing them (jax.checkpoint) — the TPU analog of the reference's
    # lora_gradient_checkpointing / torch checkpointing flags. This trades
    # FLOPs for activation memory, NOT for speed: at bs=64@640 on one v5e it
    # measures +105 ms/step (docs/tpu_performance.md) — use it only when the
    # un-remat step OOMs (bigger models/batches), never for throughput.
    grad_target = jax.checkpoint(loss_fn) if remat else loss_fn

    def grad_fn(params, batch, step_idx, moe_gain=None, aux_ema=None):
        """Gradients, optionally accumulated over micro-batches (the functional
        analog of the reference's nbs grad accumulation, trainer.py:649-666)."""
        if accumulate <= 1:
            return jax.value_and_grad(grad_target, has_aux=True)(params, batch, step_idx, moe_gain, aux_ema)
        micro = jax.tree_util.tree_map(
            lambda a: a.reshape(accumulate, a.shape[0] // accumulate, *a.shape[1:]), batch
        )

        def micro_step(mb, ema):
            return jax.value_and_grad(grad_target, has_aux=True)(params, mb, step_idx, moe_gain, ema)

        first_mb = jax.tree_util.tree_map(lambda a: a[0], micro)
        (total, (metrics, updates, ema)), grads = micro_step(first_mb, aux_ema)
        for i in range(1, accumulate):
            mb = jax.tree_util.tree_map(lambda a: a[i], micro)
            (t_i, (m_i, updates, ema)), g_i = micro_step(mb, ema)
            grads = jax.tree_util.tree_map(lambda a, g: a + g, grads, g_i)
            metrics = jax.tree_util.tree_map(lambda a, m: a + m, metrics, m_i)
            total = total + t_i
        k = float(accumulate)
        grads = jax.tree_util.tree_map(lambda g: g / k, grads)
        metrics = jax.tree_util.tree_map(lambda m: m / k, metrics)
        return (total / k, (metrics, updates, ema)), grads

    def step(state: TrainState, batch, moe_gain=None):
        (total, (loss_metrics, bn_updates, new_aux_ema)), grads = grad_fn(
            state.params, batch, state.step, moe_gain, state.aux_ema
        )
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
        new_state = TrainState(params, opt_state, ema, state.step + 1, n_updates, new_aux_ema)
        metrics = dict(loss_metrics)
        metrics["finite"] = finite.astype(jnp.float32)
        return new_state, metrics

    if not jit_compile:
        # raw traceable step for composition (e.g. bench.py's chained
        # multi-step timing loop jits N steps in one graph)
        return step
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))  # applies to every batch leaf
        in_sh = (repl, data, repl) if traced_moe_gain else (repl, data)
        return jax.jit(step, in_shardings=in_sh, out_shardings=(repl, repl), donate_argnums=(0,))
    return jax.jit(step, donate_argnums=(0,))
