"""Pallas TPU kernel: fused compact-layout stem (conv0 + conv1).

Why: XLA lays NHWC conv operands out over 128 lanes, so the nano stem's
C=3 @640x640 input is padded ~43x in HBM — the compiled conv0 alone accesses
1.31 GB for a 45 MB-logical op at bs=8 (`compiled.cost_analysis()`), and the
two stem convs cost 34% of the whole yolo-master-n forward. This kernel takes
the image in a space-to-depth(4) blob layout ([48, hb, Wq]: 16 spatial phases
x 3 channels leading, spatial minor — produced by host preprocessing exactly
like the reference's TensorRT NCHW blob step), computes

    conv0 (3 -> c0, k3 s2 p1) + bias + SiLU
    conv1 (c0 -> c1, k3 s2 p1) + bias + SiLU

entirely in VMEM and writes the [H/4, W/4, c1] NHWC tensor the rest of the
network consumes. Logical traffic: ~2.4 MB in + ~1.6 MB out per 640px image.

Mosaic constraints shaped this design (each found by bisection on v5e):
  * stride-2 phase access can't be expressed in-kernel (no minor-dim
    reshapes/strides) -> the s2d(4) blob makes every tap a STATIC slice;
  * dot_general contracting the LEADING dim needs a 128-multiple lane dim ->
    the blob lane dim is padded;
  * dynamic row loads need 16-aligned starts -> stripes are 16-multiples and
    tap row offsets are value-level slices of an aligned superset load;
  * 2D->3D mask broadcasts are rejected -> masks come from 3D iotas;
  * scoped VMEM is 16 MB and sub-128 minor dims pad to 128 lanes -> the four
    conv0 phase tensors are PACKED into one [P, Wq, 4*c0] tensor by widening
    each tap's weight matrix into its phase's channel range (W0eff [cin, 4c0]
    per (phase, tap); W1eff [4c0, c1] per spatial offset) — conv1 then needs
    NO lane slicing: one dot per offset pair contracts all 4*c0 channels.

Index algebra (pad-4 blob, raw row = 4u + t): conv0 is evaluated on conv1's
padded grid I = 2p + a - 1; raw row = 4p + (2a + d0 - 3); with t + 4 =
4*off + m the access is blob[phase m, p + off], off in {0,1} static per
(a, d0). Rows I outside [0, H/2) are conv1 zero-padding, masked after SiLU.

Grid: (B, row-stripes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lane_pad(n: int) -> int:
    return ((n + 127) // 128) * 128


def s2d4_blob(x_nchw: jnp.ndarray) -> jnp.ndarray:
    """[B, 3, H, W] -> [B, 48, hb_pad, Wq] space-to-depth(4) blob (pad 4 per
    side = one blob cell; rows 16-aligned + halo, lanes 128-padded + one
    extra 128 block for the +-1 column taps). Host/preprocess-side op."""
    B, C, H, W = x_nchw.shape
    xp = jnp.pad(x_nchw, ((0, 0), (0, 0), (4, 4), (4, 4)))
    hb, wb = H // 4 + 2, W // 4 + 2
    xb = xp.reshape(B, C, hb, 4, wb, 4)
    # channel g = (m_r * 4 + m_c) * C + c
    xb = xb.transpose(0, 3, 5, 1, 2, 4).reshape(B, 16 * C, hb, wb)
    hb_pad = ((hb + 15) // 16) * 16 + 16
    wq = _lane_pad(wb) + 128
    return jnp.pad(xb, ((0, 0), (0, 0), (0, hb_pad - hb), (0, wq - wb)))


def s2d4_blob_np(x_nchw: np.ndarray) -> np.ndarray:
    """numpy twin of :func:`s2d4_blob` for host preprocessing."""
    B, C, H, W = x_nchw.shape
    xp = np.pad(x_nchw, ((0, 0), (0, 0), (4, 4), (4, 4)))
    hb, wb = H // 4 + 2, W // 4 + 2
    xb = xp.reshape(B, C, hb, 4, wb, 4)
    xb = xb.transpose(0, 3, 5, 1, 2, 4).reshape(B, 16 * C, hb, wb)
    hb_pad = ((hb + 15) // 16) * 16 + 16
    wq = _lane_pad(wb) + 128
    return np.ascontiguousarray(np.pad(xb, ((0, 0), (0, 0), (0, hb_pad - hb), (0, wq - wb))))


def _expand_weights(w0, w1):
    """Widen tap weights into the packed-phase channel space.

    Returns
      w0eff [9, cin, 4*c0]: tap (d0,e0) weights written into every phase's
        channel range (the phase choice only changes WHICH blob channels and
        row/col offsets the tap reads — handled by the kernel's slice table);
      w1eff [4, 4*c0, c1]: for spatial offset (offr, offc), the conv1 taps
        that land on that offset, laid against their phase's channel range.
    """
    kh, kw, cin, c0 = w0.shape
    c1 = w1.shape[-1]
    w0 = w0.astype(jnp.float32)
    w1 = w1.astype(jnp.float32)
    w0eff = jnp.zeros((2, 2, 3, 3, cin, 4 * c0), jnp.float32)
    for a in range(2):
        for b in range(2):
            ph = a * 2 + b
            for d0 in range(3):
                for e0 in range(3):
                    w0eff = w0eff.at[a, b, d0, e0, :, ph * c0:(ph + 1) * c0].set(w0[d0, e0])
    w0eff = w0eff.reshape(36 * cin, 4 * c0)  # tap-major concat (kernel pcat order)
    w1eff = jnp.zeros((2, 2, 4 * c0, c1), jnp.float32)
    for d1 in range(3):
        for e1 in range(3):
            ph = (d1 % 2) * 2 + (e1 % 2)
            offr, offc = d1 // 2, e1 // 2
            w1eff = w1eff.at[offr, offc, ph * c0:(ph + 1) * c0, :].add(w1[d1, e1])
    return w0eff, w1eff


def _make_stem_kernel(H: int, W: int, cin: int, c0: int, WQ: int, S: int):
    Ho2, Wo2 = H // 2, W // 2
    Ho4, Wo4 = H // 4, W // 4
    P = S + 1  # conv0 rows per stripe (+1 halo)

    def kernel(x_ref, w0_ref, b0_ref, w1_ref, b1_ref, out_ref):
        s0 = pl.program_id(1) * S
        w0e = w0_ref[...]   # [36*cin, 4c0] f32 (tap-major concat)
        b0 = b0_ref[...]    # [4c0] f32, pre-tiled per packed phase
        w1e = w1_ref[...]   # [2,2,4c0,c1] f32
        b1 = b1_ref[...]    # [c1] f32
        C4 = 4 * c0

        # gather all 36 tap patches, concat on the contraction dim, ONE dot:
        # 36 accumulating dots thrash VMEM (each rewrites the [P,WQ,4c0] acc);
        # one [36*cin, P, WQ] x [36*cin, 4c0] contraction writes it once.
        patches = []
        for a in range(2):
            for b in range(2):
                for d0 in range(3):
                    for e0 in range(3):
                        tr, tc = 2 * a + d0 - 3, 2 * b + e0 - 3
                        mr, offr = (tr + 4) % 4, (tr + 4) // 4
                        mc, offc = (tc + 4) % 4, (tc + 4) // 4
                        g = (mr * 4 + mc) * cin
                        # 16-aligned superset load, value-level tap slicing
                        block = x_ref[0, g: g + cin, pl.ds(s0, P + 15), :]
                        patches.append(block[:, offr: offr + P, offc: offc + WQ])
        pcat = jnp.concatenate(patches, axis=0)  # [36*cin, P, WQ]
        acc = jax.lax.dot_general(
            pcat.astype(jnp.float32), w0e,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        # bias + SiLU + conv1-padding mask, per packed lane's phase
        lane = jax.lax.broadcasted_iota(jnp.int32, (P, WQ, C4), 2)
        la = lane // (2 * c0)            # phase row bit a
        lb = (lane // c0) % 2            # phase col bit b
        rows = jax.lax.broadcasted_iota(jnp.int32, (P, WQ, C4), 0) + s0
        cols = jax.lax.broadcasted_iota(jnp.int32, (P, WQ, C4), 1)
        acc = acc + b0  # [4c0]: pre-tiled on host — an in-kernel tile(b0, 4)
        # lowers to a lane concatenate Mosaic rejects once 4*c0 > 128 (m-scale)
        acc = acc * jax.nn.sigmoid(acc)
        I = 2 * rows + la - 1
        J = 2 * cols + lb - 1
        acc = jnp.where((I >= 0) & (I < Ho2) & (J >= 0) & (J < Wo2), acc, 0.0)

        # conv1: one dot per spatial offset pair, contracting all 4c0 lanes
        acc1 = jnp.zeros((S, Wo4, w1e.shape[-1]), jnp.float32)
        for offr in range(2):
            for offc in range(2):
                patch = acc[offr: offr + S, offc: offc + Wo4, :]
                acc1 = acc1 + jax.lax.dot_general(
                    patch, w1e[offr, offc],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        acc1 = acc1 + b1
        acc1 = acc1 * jax.nn.sigmoid(acc1)
        out_ref[0] = acc1.astype(out_ref.dtype)

    return kernel


@partial(jax.jit, static_argnames=("height", "width", "interpret"))
def fused_stem(blob, w0, b0, w1, b1, height: int, width: int = 0, interpret: bool = False):
    """blob [B, 16*cin, hb_pad, Wq] (from :func:`s2d4_blob`) ->
    [B, H/4, W/4, c1] NHWC. w0 [3,3,cin,c0], w1 [3,3,c0,c1] HWIO with BN
    pre-folded into biases. ``height``/``width``: true image size (blob dims
    are alignment-padded; width defaults to height)."""
    B, GC, hb_pad, wql = blob.shape
    cin = GC // 16
    H = height
    W = width or H
    WQ = wql - 128
    c0, c1 = w0.shape[-1], w1.shape[-1]
    Ho4 = H // 4
    # single stripe when the working set fits the raised VMEM budget; else
    # 16-aligned stripes. The estimate counts the DOUBLE-BUFFERED in/out
    # windows (2 buffering levels each — omitting them under-counted by ~27 MB
    # at m-scale c0=64/c1=128 and OOMed the 128 MB vmem cap by 116 KB)
    def vmem_est(S_):
        P_ = S_ + 1
        return (
            (P_ * WQ * 4 * c0 * 4)  # f32 conv0 accumulator
            + (36 * cin * (S_ + 16) * wql * 2)  # tap patch loads (bf16)
            + 2 * GC * hb_pad * wql * 2  # input window x2 buffers
            + 2 * S_ * (W // 4) * c1 * 2  # output window x2 buffers
        )
    S = Ho4
    if vmem_est(S) > 72 * 1024 * 1024:
        for cand in (32, 16):
            if Ho4 % cand == 0:
                S = cand
                break
    w0eff, w1eff = _expand_weights(w0, w1)
    kernel = _make_stem_kernel(H, W, cin, c0, WQ, S)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Ho4, W // 4, c1), blob.dtype),
        grid=(B, Ho4 // S),
        in_specs=[
            pl.BlockSpec((1, GC, hb_pad, wql), lambda i, s: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, W // 4, c1), lambda i, s: (i, s, 0, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(blob, w0eff, jnp.tile(jnp.asarray(b0, jnp.float32), 4), w1eff, jnp.asarray(b1, jnp.float32))
