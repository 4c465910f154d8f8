"""Optimizers: Muon / MuSGD (reference: ultralytics/optim/muon.py:9-254 —
Newton-Schulz orthogonalized momentum for matrix-shaped weights, SGD-style
fallback for vectors/scalars), as optax transformations."""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

_NS_COEFFS = (3.4445, -4.7750, 2.0315)


def newton_schulz_orthogonalize(g: jnp.ndarray, steps: int = 5, eps: float = 1e-7) -> jnp.ndarray:
    """Approximate UV^T of the matrix g via quintic Newton-Schulz iteration
    (reference muon.py zeropower_via_newtonschulz semantics)."""
    a, b, c = _NS_COEFFS
    orig_shape = g.shape
    if g.ndim == 4:
        # HWIO conv kernel: matricize as [O, H*W*I] to match the reference's
        # torch OIHW `g.reshape(O, -1)` — orthogonalization must act on the
        # output-channel-by-fan-in matrix, not [kh, kw*I*O]
        x = g.transpose(3, 0, 1, 2).reshape(orig_shape[3], -1)
    elif g.ndim > 2:
        x = g.reshape(orig_shape[0], -1)
    else:
        x = g
    transposed = x.shape[0] > x.shape[1]
    if transposed:
        x = x.T
    x = x / (jnp.linalg.norm(x) + eps)

    def body(_, x):
        xxt = x @ x.T
        return a * x + (b * xxt + c * (xxt @ xxt)) @ x

    x = jax.lax.fori_loop(0, steps, body, x)
    if transposed:
        x = x.T
    if g.ndim == 4:
        h, w, i, o = orig_shape
        return x.reshape(o, h, w, i).transpose(1, 2, 3, 0)
    return x.reshape(orig_shape)


class MuonState(NamedTuple):
    momentum: optax.Updates


def muon(
    learning_rate,
    momentum: float = 0.95,
    nesterov: bool = True,
    ns_steps: int = 5,
) -> optax.GradientTransformation:
    """Muon: orthogonalized momentum for >=2D weights; plain momentum-SGD
    semantics for 1D leaves (the reference's MuSGD pairs Muon for matrices
    with SGD for the rest)."""

    def init_fn(params):
        return MuonState(jax.tree_util.tree_map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        mom = jax.tree_util.tree_map(lambda m, g: momentum * m + g, state.momentum, updates)

        def direction(m, g):
            u = momentum * m + g if nesterov else m
            if u.ndim >= 2:
                o = newton_schulz_orthogonalize(u, ns_steps)
                # scale like the reference: sqrt(max(1, rows/cols)) keeps RMS;
                # rows/cols follow the same matricization as the NS iteration
                if u.ndim == 4:  # HWIO -> [O, H*W*I]
                    rows = u.shape[3]
                    cols = u.shape[0] * u.shape[1] * u.shape[2]
                else:
                    rows = u.shape[0]
                    cols = int(jnp.prod(jnp.asarray(u.shape[1:])))
                return o * jnp.sqrt(jnp.maximum(1.0, rows / max(cols, 1)))
            return u

        if callable(learning_rate):
            raise ValueError("use musgd() / optax.scale_by_schedule for scheduled LR")
        dirs = jax.tree_util.tree_map(direction, mom, updates)
        out = jax.tree_util.tree_map(lambda u: -learning_rate * u, dirs)
        return out, MuonState(mom)

    return optax.GradientTransformation(init_fn, update_fn)


def musgd(learning_rate, momentum: float = 0.95, weight_decay: float = 0.0, params=None):
    """MuSGD (reference muon.py:99): Muon direction + optional decoupled wd,
    scheduled LR via optax composition."""
    from .engine.train_step import weight_decay_mask

    txs = []
    if weight_decay and params is not None:
        txs.append(optax.add_decayed_weights(weight_decay, mask=weight_decay_mask(params)))
    txs.append(muon(1.0, momentum=momentum))
    txs.append(optax.scale_by_schedule(lambda c: learning_rate(c) if callable(learning_rate) else learning_rate))
    return optax.chain(*txs)
