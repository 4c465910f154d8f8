"""Pallas TPU kernel: whole-block C3k2 (plain-Bottleneck form) in VMEM.

Why: the first C3k2 (32->64ch @160x160) costs 0.25 ms of the 1.0 ms
yolo-master-n forward — ~10 XLA ops on 128-lane-padded small-channel
tensors (65+ MB HBM traffic against an ~80 us roofline). At these sizes the
ENTIRE activation fits VMEM (3.3 MB fp32), so one kernel computes

    y  = SiLU(x @ Wcv1 + b)              # cv1 1x1
    h  = y_b                             # second half of the split
    for each bottleneck:
        a = SiLU(conv3x3(h) ...)         # as 9 shifted dots
        a = SiLU(conv3x3(a) ...)
        h = h + a                        # shortcut
    out = SiLU([y_a, y_b, h...] @ Wcv2 + b)

with two Mosaic-shaped tricks (same playbook as ops/pallas_stem.py):
  * NO lane slicing: the channel split never happens — bottleneck weights
    are zero-padded to full width ([C, c] with zeros on the y_a rows) and
    the final concat is folded into per-segment Wcv2 row blocks, so every
    op is a full-width dot;
  * k3 taps are value-level shifts on the SUBLANE dims of a zero-padded
    copy (lane dim untouched), one accumulating dot per tap.

Weights are prepared host-side by :func:`prepare_c3k2_weights` from the
BN-folded C3k2 param tree. Exact (same math, fp32 accumulation).

STATUS (measured v5e @160x160x32, bs=1): parity exact in both variants, but
neither beats XLA yet — the NHWC variant times 0.11-0.23 ms vs plain
0.10-0.17 ms (run-to-run compile variance is large on the tunneled rig),
lane-poor [H,W,32] layouts cap the dots at 25% lane use; the channels-first
variant (spatial lanes, the stem kernel's trick) is parity-exact in
interpret mode but its roll-based column taps push Mosaic compile time
beyond 20 minutes on this rig. Kept as documented, tested experiments —
the default fast path remains BN-fold + Pallas stem (ops/pallas_stem.py).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def prepare_c3k2_weights(folded: Dict, c: int, n: int) -> Dict:
    """BN-folded C3k2 params -> kernel weight dict.

    Layout contract (C2f forward): y = cv1(x) [2c]; ys = [y[:c], y[c:]];
    each bottleneck maps ys[-1] -> ys.append; cv2 consumes concat(ys) [(2+n)c].
    We keep h_i full-width ([2c] with the active segment in lanes c:2c for
    h_0=y_b, and in lanes 0:c for bottleneck outputs) — selector matmuls
    re-route segments without lane slicing."""
    out = {}

    def wb(node):
        return np.asarray(node["conv"]["w"], np.float32), np.asarray(node["conv"]["b"], np.float32)

    w1, b1 = wb(folded["cv1"])  # [1,1,C,2c]
    out["cv1_w"] = w1.reshape(w1.shape[2], w1.shape[3])
    out["cv1_b"] = b1
    # bottleneck i: in-segment selector folded into its cv1 weight
    for i in range(n):
        m = folded["m"][str(i)]
        wa, ba = wb(m["cv1"])  # [3,3,c,cb] (inner hidden cb = c * 0.5)
        wz, bz = wb(m["cv2"])  # [3,3,cb,c]
        cb = wa.shape[3]
        # input of bottleneck 0 lives in lanes c:2c of y; later ones in 0:c
        lo = c if i == 0 else 0
        wa_full = np.zeros((3, 3, 2 * c, cb), np.float32)
        wa_full[:, :, lo : lo + c, :] = wa
        out[f"m{i}_w1"] = wa_full.reshape(9, 2 * c, cb)
        out[f"m{i}_b1"] = ba
        out[f"m{i}_w2"] = wz.reshape(9, cb, c)
        out[f"m{i}_b2"] = bz
        # residual selector: h_prev segment -> lanes 0:c of the new h
        sel = np.zeros((2 * c, c), np.float32)
        sel[lo : lo + c] = np.eye(c, dtype=np.float32)
        out[f"m{i}_sel"] = sel
    w2, b2 = wb(folded["cv2"])  # [1,1,(2+n)c,C2]
    w2 = w2.reshape(w2.shape[2], w2.shape[3])
    # split cv2 rows per segment: y (first 2c rows) and each bottleneck output
    out["cv2_y"] = w2[: 2 * c]                      # consumes y full-width
    for i in range(n):
        seg = w2[(2 + i) * c : (3 + i) * c]         # [c, C2]
        pad = np.zeros((2 * c, seg.shape[1]), np.float32)
        pad[:c] = seg                               # h_i active lanes are 0:c
        out[f"cv2_m{i}"] = pad
    out["cv2_b"] = b2
    return {k: jnp.asarray(v) for k, v in out.items()}


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _make_kernel(H: int, W: int, c: int, n: int, names):
    def kernel(x_ref, *refs):
        w = {name: r[...] for name, r in zip(names, refs[:-1])}
        out_ref = refs[-1]
        x = x_ref[0].astype(jnp.float32)  # [H, W, C]

        y = _silu(
            jax.lax.dot_general(x, w["cv1_w"], (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) + w["cv1_b"]
        )  # [H, W, 2c]

        zrow = jnp.zeros((1, W, 2 * c), jnp.float32)
        zcol = jnp.zeros((H + 2, 1, 2 * c), jnp.float32)
        h = y
        acc_out = jax.lax.dot_general(y, w["cv2_y"], (((2,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        for i in range(n):
            # conv1 (k3) over h's active segment: zero-pad rows/cols, 9 taps
            cb = w[f"m{i}_b1"].shape[0]
            hp = jnp.concatenate([zrow, h, zrow], 0)
            hp = jnp.concatenate([zcol, hp, zcol], 1)
            a = jnp.zeros((H, W, cb), jnp.float32)
            for t in range(9):
                di, dj = t // 3, t % 3
                tap = hp[di : di + H, dj : dj + W, :]
                a = a + jax.lax.dot_general(tap, w[f"m{i}_w1"][t], (((2,), (0,)), ((), ())),
                                            preferred_element_type=jnp.float32)
            a = _silu(a + w[f"m{i}_b1"])
            zrow_c = jnp.zeros((1, W, cb), jnp.float32)
            zcol_c = jnp.zeros((H + 2, 1, cb), jnp.float32)
            ap = jnp.concatenate([zrow_c, a, zrow_c], 0)
            ap = jnp.concatenate([zcol_c, ap, zcol_c], 1)
            z = jnp.zeros((H, W, c), jnp.float32)
            for t in range(9):
                di, dj = t // 3, t % 3
                tap = ap[di : di + H, dj : dj + W, :]
                z = z + jax.lax.dot_general(tap, w[f"m{i}_w2"][t], (((2,), (0,)), ((), ())),
                                            preferred_element_type=jnp.float32)
            z = _silu(z + w[f"m{i}_b2"])
            # shortcut: new h's active lanes 0:c = prev segment + z
            resid = jax.lax.dot_general(h, w[f"m{i}_sel"], (((2,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            hseg = resid + z  # [H, W, c]
            h = jnp.concatenate([hseg, jnp.zeros((H, W, c), jnp.float32)], -1)
            acc_out = acc_out + jax.lax.dot_general(h, w[f"cv2_m{i}"], (((2,), (0,)), ((), ())),
                                                    preferred_element_type=jnp.float32)
        out_ref[0] = _silu(acc_out + w["cv2_b"]).astype(out_ref.dtype)

    return kernel


@partial(jax.jit, static_argnames=("c", "n", "interpret"))
def pallas_c3k2(x, weights: Dict, c: int, n: int, interpret: bool = False):
    """x [B, H, W, C] -> [B, H, W, C2] — the whole C3k2 block in one kernel.
    ``weights`` from :func:`prepare_c3k2_weights`; c/n are the block's hidden
    width and bottleneck count."""
    B, H, W, C = x.shape
    names = sorted(weights.keys())
    c2 = weights["cv2_b"].shape[0]
    return pl.pallas_call(
        _make_kernel(H, W, c, n, names),
        out_shape=jax.ShapeDtypeStruct((B, H, W, c2), x.dtype),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(names),
        out_specs=pl.BlockSpec((1, H, W, c2), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, *[weights[k] for k in names])


def _make_kernel_cf(H: int, W: int, c: int, n: int, names, WP: int):
    """Channels-first variant: tensors live as [C, H, Wpad] so the LANE dim is
    spatial width (dense) instead of the 32-channel axis (25% lane use) —
    the layout that made the stem kernel fast. Contractions run over the
    leading channel dim; k3 taps are sublane/lane value slices of a
    zero-padded copy."""

    def dotc(t, wmat):
        # t [Cin, H, WP] x wmat [Cin, Cout] -> [Cout, H, WP]
        return jax.lax.dot_general(wmat, t, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def kernel(x_ref, *refs):
        w = {name: r[...] for name, r in zip(names, refs[:-1])}
        out_ref = refs[-1]
        x = x_ref[0].astype(jnp.float32)  # [C, H, WP]

        y = _silu(dotc(x, w["cv1_w"]) + w["cv1_b"])  # [2c, H, WP]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, WP), 2)
        wmask = (lane < W).astype(jnp.float32)
        y = y * wmask  # zero the width padding (SiLU(bias) leaked there)

        h = y
        acc = dotc(y, w["cv2_y"])
        for i in range(n):
            cb = w[f"m{i}_b1"].shape[0]  # biases are [C, 1, 1] in cf form
            # pad rows and cols by 1 (cols only on the left; right pad uses
            # the existing width padding)
            hp = jnp.concatenate([jnp.zeros((2 * c, 1, WP), jnp.float32), h,
                                  jnp.zeros((2 * c, 1, WP), jnp.float32)], 1)
            taps = []
            for t in range(9):
                di, dj = t // 3, t % 3
                block = hp[:, di : di + H, :]
                # column taps via lane ROTATION (Mosaic rejects lane concat):
                # padding lanes are kept zero by wmask, so wrapped values are
                # zeros where they land on valid columns
                if dj != 1:
                    block = pltpu.roll(block, (1 - dj) % WP, 2)
                taps.append(block)
            pcat = jnp.concatenate(taps, 0)  # [9*2c, H, WP]
            a = _silu(dotc(pcat, w[f"m{i}_w1"].reshape(9 * 2 * c, cb)) + w[f"m{i}_b1"])
            a = a * wmask
            ap = jnp.concatenate([jnp.zeros((cb, 1, WP), jnp.float32), a,
                                  jnp.zeros((cb, 1, WP), jnp.float32)], 1)
            taps = []
            for t in range(9):
                di, dj = t // 3, t % 3
                block = ap[:, di : di + H, :]
                # column taps via lane ROTATION (Mosaic rejects lane concat):
                # padding lanes are kept zero by wmask, so wrapped values are
                # zeros where they land on valid columns
                if dj != 1:
                    block = pltpu.roll(block, (1 - dj) % WP, 2)
                taps.append(block)
            pcat2 = jnp.concatenate(taps, 0)  # [9*cb, H, WP]
            z = _silu(dotc(pcat2, w[f"m{i}_w2"].reshape(9 * cb, c)) + w[f"m{i}_b2"])
            z = z * wmask
            hseg = dotc(h, w[f"m{i}_sel"]) + z
            h = jnp.concatenate([hseg, jnp.zeros((c, H, WP), jnp.float32)], 0)
            acc = acc + dotc(h, w[f"cv2_m{i}"])
        out = _silu(acc + w["cv2_b"]) * wmask
        out_ref[0] = out.astype(out_ref.dtype)

    return kernel


@partial(jax.jit, static_argnames=("c", "n", "interpret"))
def pallas_c3k2_cf(x, weights: Dict, c: int, n: int, interpret: bool = False):
    """Channels-first pallas C3k2: x [B, H, W, C] NHWC in/out; the kernel works
    on [C, H, Wpad] internally (XLA transposes at the boundary)."""
    B, H, W, C = x.shape
    WP = ((W + 127) // 128) * 128
    # Mosaic rejects in-kernel 1D->3D bias broadcasts; pre-shape to [C, 1, 1]
    weights = {k: (v.reshape(-1, 1, 1) if k.endswith(("_b", "_b1", "_b2")) else v)
               for k, v in weights.items()}
    xt = jnp.transpose(x, (0, 3, 1, 2))
    xt = jnp.pad(xt, ((0, 0), (0, 0), (0, 0), (0, WP - W)))
    names = sorted(weights.keys())
    c2 = weights["cv2_b"].shape[0]
    out = pl.pallas_call(
        _make_kernel_cf(H, W, c, n, names, WP),
        out_shape=jax.ShapeDtypeStruct((B, c2, H, WP), x.dtype),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, C, H, WP), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(names),
        out_specs=pl.BlockSpec((1, c2, H, WP), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xt, *[weights[k] for k in names])
    return jnp.transpose(out[:, :, :, :W], (0, 2, 3, 1))
