"""Space-to-depth(2) BLOCKED execution for small-channel stages.

Why (measured on v5e): the yolo-master-n forward is HBM-bandwidth-bound
(9.7 GFLOP but 983 MB accessed -> ~1.2 ms roofline at 820 GB/s; 2% MXU
utilization). The bytes come from XLA's 128-lane padding of early stages:
the first C3k2 runs at C=16..64 on 160x160 maps (4-8x lane inflation) and
alone costs 0.25 ms of the 1.0 ms forward.

The fix is a LAYOUT, not a kernel: re-lay [H, W, C] as 2x2 blocks
[H/2, W/2, 4C] (c-major channel index ``c*4 + phase`` so channel
split/concat stay contiguous lane slices) and remap every conv weight into
the blocked space. Then:

  * 1x1 convs become [4C, 4C'] matmuls, block-diagonal per phase;
  * k3 s1 p1 convs become k3 blocked convs: output phase (a,b) needs input
    rows 2i+a+di whose block offset floor((a+di)/2) spans {-1,0,1} — the
    builder scatters w taps into a [3, 3, 4C, 4C'] kernel (zeros where a
    phase pair never meets);
  * the stage-exit k3 s2 p1 conv consumes blocks NATIVELY (rows 2i+di hit
    block offsets {-1,0} only) -> a 2x2 blocked conv emitting plain NHWC,
    so leaving the blocked region is free.

Everything is exact (weight scatter, no approximation) and pure XLA — the
only costs are one relayout transpose at entry and 4x denser (but still
bandwidth-dominated) FLOPs. BN must be pre-folded (fuse_bn_params).

Measured on v5e @640 bs=1: ISOLATED the blocked C3k2 is 2.3x faster than the
plain block (0.064 vs 0.147 ms; 59 vs 139 MB accessed) — but IN-GRAPH the
full model regresses (1.13 -> 1.21-1.28 ms): inserting the blocked convs
shifts XLA's global layout assignment and the relayout copies it adds
elsewhere outweigh the local win. Kept exact + opt-in
(utils/fuse.py block_c3k2) for pipelines that keep whole stages blocked;
the default deploy surgery remains BN-fold + Pallas stem.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .layers import C2f, Conv
from .module import Context, Module, Params


def to_blocked(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/2, W/2, 4C], channel index c*4 + (a*2 + b)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.transpose(0, 1, 3, 5, 2, 4).reshape(B, H // 2, W // 2, 4 * C)


def from_blocked(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`to_blocked`."""
    B, Hb, Wb, C4 = x.shape
    x = x.reshape(B, Hb, Wb, C4 // 4, 2, 2)
    return x.transpose(0, 1, 4, 2, 5, 3).reshape(B, Hb * 2, Wb * 2, C4 // 4)


def block_weight(w: np.ndarray) -> np.ndarray:
    """HWIO kxk s1 p=k//2 weight -> blocked [KB, KB, 4ci, 4co] weight."""
    kh, kw, ci, co = w.shape
    r = kh // 2
    lo, hi = (0 - r) // 2, (1 + r) // 2
    KB = hi - lo + 1
    wb = np.zeros((KB, KB, 4 * ci, 4 * co), np.float32)
    ci_idx, co_idx = np.arange(ci) * 4, np.arange(co) * 4
    for a in range(2):
        for b in range(2):
            po = a * 2 + b
            for di in range(-r, r + 1):
                for dj in range(-r, r + 1):
                    ra, cb = a + di, b + dj
                    br, pa = ra // 2, ra % 2
                    bc, pb = cb // 2, cb % 2
                    pi = pa * 2 + pb
                    wb[br - lo, bc - lo][np.ix_(ci_idx + pi, co_idx + po)] += np.asarray(
                        w[di + r, dj + r], np.float32
                    )
    return wb


def block_exit_weight(w: np.ndarray) -> np.ndarray:
    """HWIO k3 s2 p1 weight -> [2, 2, 4ci, co] blocked-input weight (the
    stage-exit downsample: output grid == block grid, no un-blocking)."""
    kh, kw, ci, co = w.shape
    assert kh == kw == 3
    wb = np.zeros((2, 2, 4 * ci, co), np.float32)
    ci_idx = np.arange(ci) * 4
    for di in range(-1, 2):
        for dj in range(-1, 2):
            br, pa = di // 2, di % 2
            bc, pb = dj // 2, dj % 2
            pi = pa * 2 + pb
            wb[br + 1, bc + 1][ci_idx + pi] += np.asarray(w[di + 1, dj + 1], np.float32)
    return wb


def block_bias(b: np.ndarray) -> np.ndarray:
    return np.repeat(np.asarray(b, np.float32), 4)


def _bconv(x, w, b, pad, act=True):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b.astype(x.dtype)
    return y * jax.nn.sigmoid(y) if act else y


class BlockedC3k2(Module):
    """Deploy-time blocked replacement for a plain-Bottleneck C3k2
    (c3k=False, attn=False). Consumes/produces regular NHWC; runs blocked
    inside. Params are the remapped tree from :meth:`remap_params`."""

    def __init__(self, orig: C2f):
        super().__init__()
        from .layers import Bottleneck

        assert all(isinstance(m, Bottleneck) for m in orig.m), "blocked C3k2 supports plain Bottleneck inner"
        self.c = orig.c
        self.n = orig.n
        self.adds = [m.add for m in orig.m]

    @staticmethod
    def remap_params(folded: Params) -> Params:
        """BN-folded C3k2 params {cv1,cv2,m.i.cv1/cv2:{conv:{w,b}}} ->
        blocked tree (weights scattered, biases phase-repeated)."""

        def leaf(node):
            c = node["conv"]
            return {"w": jnp.asarray(block_weight(np.asarray(c["w"], np.float32))),
                    "b": jnp.asarray(block_bias(np.asarray(c["b"])))}

        out = {"cv1": leaf(folded["cv1"]), "cv2": leaf(folded["cv2"]), "m": {}}
        for i, sub in folded["m"].items():
            out["m"][i] = {"cv1": leaf(sub["cv1"]), "cv2": leaf(sub["cv2"])}
        return out

    def __call__(self, p: Params, x, ctx: Context):
        xb = to_blocked(x)
        y = _bconv(xb, p["cv1"]["w"], p["cv1"]["b"], [(0, 0), (0, 0)])
        c4 = 4 * self.c
        ys = [y[..., :c4], y[..., c4:]]
        for i in range(self.n):
            sub = p["m"][str(i)]
            a = _bconv(ys[-1], sub["cv1"]["w"], sub["cv1"]["b"], [(1, 1), (1, 1)])
            a = _bconv(a, sub["cv2"]["w"], sub["cv2"]["b"], [(1, 1), (1, 1)])
            ys.append(ys[-1] + a if self.adds[i] else a)
        out = _bconv(jnp.concatenate(ys, -1), p["cv2"]["w"], p["cv2"]["b"], [(0, 0), (0, 0)])
        return from_blocked(out)
