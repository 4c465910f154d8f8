"""Core NN blocks of the YOLO-Master backbone/neck, rebuilt TPU-native (NHWC).

Behavioral parity targets (reference file:line, semantics only — no code copied):
  * Conv (conv+BN+SiLU)            ultralytics/nn/modules/conv.py:39-90
  * DWConv                         ultralytics/nn/modules/conv.py:185
  * Bottleneck                     ultralytics/nn/modules/block.py:462-487
  * C2f / C3 / C3k / C3k2          ultralytics/nn/modules/block.py:293,327,1074,1114
  * SPPF                           ultralytics/nn/modules/block.py:213-243
  * AAttn / ABlock / A2C2f         ultralytics/nn/modules/block.py:1646-1893
  * Attention / PSABlock           ultralytics/nn/modules/block.py (PSA family)
  * Concat                         ultralytics/nn/modules/conv.py:616
  * DFL integral decode            ultralytics/nn/modules/block.py:63-85

Layout: activations are NHWC (TPU-native); conv kernels are HWIO. The torch
reference is NCHW/OIHW — the checkpoint importer transposes (utils/torch_import).

BatchNorm: Ultralytics re-initializes every BN to eps=1e-3, momentum=0.03
(ultralytics/utils/torch_utils.py initialize_weights); we adopt those defaults.
Per-device (non-synced) batch stats match the reference's per-rank BN choice
(SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .module import (
    Context,
    Module,
    ModuleList,
    Params,
    conv_bias_uniform,
    kaiming_uniform_conv,
    trunc_normal,
)

# ---------------------------------------------------------------------------
# Functional primitives
# ---------------------------------------------------------------------------

def autopad(k, p=None, d: int = 1):
    """'same' padding for odd kernels (reference conv.py:30-36). k may be int or tuple."""
    if isinstance(k, (tuple, list)):
        return tuple(autopad(kk, p, d) for kk in k)
    if d > 1:
        k = d * (k - 1) + 1
    return k // 2 if p is None else p


def conv2d(x, w, *, stride=1, padding=0, groups=1, dilation=1):
    """NHWC conv with HWIO kernel.

    1x1/stride-1/ungrouped kernels take the dot (einsum) path: identical math
    on the MXU, but under vmap with batched kernels (gathered MoE dispatch,
    nn/moe/dispatch.py) einsum batches into one large GEMM while
    conv_general_dilated lowers to a degenerate B*K-group conv (measured
    36 ms -> ~4 ms on the v0.1-L P3 MoE block, bs=16 @80x80x512)."""
    if (w.shape[0] == w.shape[1] == 1 and groups == 1
            and stride in (1, (1, 1)) and padding in (0, (0, 0))):
        return jnp.einsum("bhwi,io->bhwo", x, w[0, 0].astype(x.dtype))
    s = (stride, stride) if isinstance(stride, int) else stride
    d = (dilation, dilation) if isinstance(dilation, int) else dilation
    if isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    else:
        pad = [(p, p) for p in padding]
    return lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=s,
        padding=pad,
        rhs_dilation=d,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def silu(x):
    return x * jax.nn.sigmoid(x)


def max_pool(x, k: int, stride: int = 1, padding: Optional[int] = None):
    p = k // 2 if padding is None else padding
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (p, p), (p, p), (0, 0)),
    )


def upsample_nearest(x, scale: int = 2):
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, scale, W, scale, C))
    return x.reshape(B, H * scale, W * scale, C)


# ---------------------------------------------------------------------------
# BatchNorm
# ---------------------------------------------------------------------------

class BatchNorm(Module):
    """BatchNorm2d over NHWC channel axis with functional running stats.

    Training uses batch statistics and emits running-stat updates into
    ``ctx.updates[self.path]`` (the functional analog of torch's in-place
    buffer writes). Eval uses the stored running stats.
    """

    def __init__(self, c: int, eps: float = 1e-3, momentum: float = 0.03):
        super().__init__()
        self.c, self.eps, self.momentum = c, eps, momentum

    def init(self, key) -> Params:
        return {
            "scale": jnp.ones((self.c,), jnp.float32),
            "bias": jnp.zeros((self.c,), jnp.float32),
            "mean": jnp.zeros((self.c,), jnp.float32),
            "var": jnp.ones((self.c,), jnp.float32),
        }

    def __call__(self, p: Params, x, ctx: Context):
        if ctx.training:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axes)
            var = jnp.var(xf, axes)
            n = math.prod(x.shape[:-1])
            # torch tracks *unbiased* variance in running stats
            unbiased = var * (n / max(n - 1, 1))
            m = self.momentum
            ctx.updates[self.path] = {
                "mean": (1 - m) * p["mean"] + m * lax.stop_gradient(mean),
                "var": (1 - m) * p["var"] + m * lax.stop_gradient(unbiased),
            }
            inv = lax.rsqrt(var + self.eps) * p["scale"]
            return ((xf - mean) * inv + p["bias"]).astype(x.dtype)
        # eval: fold stats into one FMA in the activation dtype — keeps bf16
        # chains fusion-friendly (no fp32 round-trip per layer)
        inv = (lax.rsqrt(p["var"].astype(jnp.float32) + self.eps) * p["scale"]).astype(x.dtype)
        shift = (p["bias"] - p["mean"] * lax.rsqrt(p["var"].astype(jnp.float32) + self.eps) * p["scale"]).astype(x.dtype)
        return x * inv + shift


# ---------------------------------------------------------------------------
# Conv = conv + BN + act  (the workhorse)
# ---------------------------------------------------------------------------

class Conv(Module):
    """conv2d (no bias) + BatchNorm + SiLU (reference conv.py:39-90).

    ``fuse_bn`` surgery (deploy path) folds BN into a conv bias at export time;
    at runtime the fused form is detected by the presence of params["b"].
    """

    def __init__(self, c1, c2, k=1, s=1, p=None, g=1, d=1, act: bool = True):
        super().__init__()
        if isinstance(k, (tuple, list)):
            self.kh, self.kw = k
        else:
            self.kh = self.kw = k
        self.c1, self.c2, self.s, self.g, self.d = c1, c2, s, g, d
        pp = autopad(k, p, d)
        self.p = pp if isinstance(pp, tuple) else (pp, pp)
        self.act = act
        self.bn = BatchNorm(c2)

    def init(self, key) -> Params:
        kw, kb = jax.random.split(key)
        w = kaiming_uniform_conv(kw, (self.kh, self.kw, self.c1 // self.g, self.c2))
        return {"conv": {"w": w}, "bn": self.bn.init(kb)}

    def __call__(self, p: Params, x, ctx: Context):
        y = conv2d(x, p["conv"]["w"], stride=self.s, padding=self.p, groups=self.g, dilation=self.d)
        if "b" in p["conv"]:  # fused form (BN folded)
            y = y + p["conv"]["b"].astype(y.dtype)
        elif "bn" in p:
            y = self.bn(p["bn"], y, ctx)
        if self.act is True:
            return silu(y)
        if self.act == "relu":  # HGNetV2 blocks use ReLU (reference block.py:110)
            return jax.nn.relu(y)
        return y


class SpaceToDepthConv(Module):
    """Inference-time EXACT rewrite of a k=3 s=2 p=1 Conv as a k=2 s=1 conv
    over 2x2 space-to-depth blocks.

    Measured on TPU v5e: the conv itself is ~2x faster on the re-laid input
    (isolated microbench, bs=8: 1.90 -> 0.98 ms for conv0, 0.81 -> 0.35 ms
    for conv1), BUT the in-graph relayout transpose costs more than the conv
    saves — e2e yolo-master-n regresses 1.45 -> 1.91 ms (strided-slice s2d is
    worse still, 5.0 ms). Kept available (exact, off by default) for inputs
    that are already block-laid or pipelines that can hoist the relayout into
    preprocessing; `YOLO.fuse(s2d=True)` opts in.

    Derivation: out(i,j) = sum_{di,dj in [-1,1]} w[di+1,dj+1] x[2i+di, 2j+dj];
    with blocks X[r,c,(dr,dc)] = x[2r+dr, 2c+dc] the needed rows 2i-1..2i+1
    live in blocks r in {i-1, i} -> k=2 VALID conv after a (1,0) top/left
    block pad, with W2[R,C,(dr,dc)] = w[2R+dr-1, 2C+dc-1] (zero if outside)."""

    def __init__(self, conv: "Conv"):
        super().__init__()
        assert conv.kh == conv.kw == 3 and conv.s == 2 and conv.g == 1 and conv.d == 1 \
            and conv.p == (1, 1), "SpaceToDepthConv rewrites k3 s2 p1 dense convs only"
        self.c1, self.c2, self.act = conv.c1, conv.c2, conv.act
        self.bn = BatchNorm(conv.c2)

    @staticmethod
    def remap_weight(w: jnp.ndarray) -> jnp.ndarray:
        """[3,3,C,O] -> [2,2,4C,O]; block-channel order (dr*2+dc)*C + ch."""
        _, _, C, O = w.shape
        w2 = jnp.zeros((2, 2, 4 * C, O), w.dtype)
        for R in range(2):
            for Cc in range(2):
                for dr in range(2):
                    for dc in range(2):
                        i, j = 2 * R + dr - 1, 2 * Cc + dc - 1
                        if 0 <= i < 3 and 0 <= j < 3:
                            k = (dr * 2 + dc) * C
                            w2 = w2.at[R, Cc, k: k + C].set(w[i, j])
        return w2

    def __call__(self, p: Params, x, ctx: Context):
        B, H, W, C = x.shape
        xs = x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
        xs = jnp.pad(xs, ((0, 0), (1, 0), (1, 0), (0, 0)))
        y = lax.conv_general_dilated(
            xs, p["conv"]["w"].astype(xs.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if "b" in p["conv"]:
            y = y + p["conv"]["b"].astype(y.dtype)
        elif "bn" in p:
            y = self.bn(p["bn"], y, ctx)
        if self.act is True:
            return silu(y)
        if self.act == "relu":
            return jax.nn.relu(y)
        return y


class PallasStem(Module):
    """Deploy-time replacement for the two k3/s2 stem Convs: one Pallas kernel
    over the compact s2d(4) input blob (ops/pallas_stem.py; measured 3.3x vs
    the XLA stem on v5e — 0.82 ms vs 2.7 ms @bs=8/640px, bit-equal outputs).
    Consumes the blob layout from s2d4_blob/s2d4_blob_np; models carrying this
    stem set ``input_blob = True`` so preprocess emits blobs."""

    def __init__(self, conv0: Conv, conv1: Conv, height: int, width: int = 0):
        super().__init__()
        for c in (conv0, conv1):
            assert c.kh == c.kw == 3 and c.s == 2 and c.g == 1 and c.d == 1 and c.p == (1, 1)
        self.c2 = conv1.c2
        self.height, self.width = height, width or height

    def __call__(self, p: Params, blob, ctx: Context):
        from ..ops.pallas_stem import fused_stem

        interpret = jax.default_backend() != "tpu"
        return fused_stem(blob, p["w0"], p["b0"], p["w1"], p["b1"],
                          height=self.height, width=self.width, interpret=interpret)


class Passthrough(Module):
    """Identity placeholder for graph nodes absorbed by a fused kernel."""

    def init(self, key) -> Params:
        return {}

    def __call__(self, p: Params, x, ctx: Context):
        return x


class DWConv(Conv):
    """Depthwise conv: groups = gcd(c1, c2) (reference conv.py:185)."""

    def __init__(self, c1, c2, k=1, s=1, d=1, act=True):
        super().__init__(c1, c2, k, s, g=math.gcd(c1, c2), d=d, act=act)


class ConvSeq(Module):
    """Sequential of modules; params keyed "0","1",... exactly like torch
    nn.Sequential state_dict naming (keeps checkpoint import mechanical)."""

    def __init__(self, *mods: Module):
        super().__init__()
        object.__setattr__(self, "mods", list(mods))
        for i, m in enumerate(mods):
            self._children[str(i)] = m

    def __len__(self):
        return len(self.mods)

    def __getitem__(self, i):
        return self.mods[i]

    def __call__(self, p: Params, x, ctx: Context):
        for i, m in enumerate(self.mods):
            x = m(p[str(i)], x, ctx)
        return x


# ---------------------------------------------------------------------------
# CSP family
# ---------------------------------------------------------------------------

class Bottleneck(Module):
    """Standard bottleneck (reference block.py:462-487)."""

    def __init__(self, c1, c2, shortcut=True, g=1, k=(3, 3), e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = Conv(c1, c_, k[0], 1)
        self.cv2 = Conv(c_, c2, k[1], 1, g=g)
        self.add = shortcut and c1 == c2

    def __call__(self, p, x, ctx):
        y = self.cv2(p["cv2"], self.cv1(p["cv1"], x, ctx), ctx)
        return x + y if self.add else y


class C3(Module):
    """CSP bottleneck, 3 convs (reference block.py:327-351)."""

    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5, bottleneck_k=((1, 1), (3, 3))):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv(c1, c_, 1, 1)
        self.cv3 = Conv(2 * c_, c2, 1)
        self.m = ModuleList([Bottleneck(c_, c_, shortcut, g, k=bottleneck_k, e=1.0) for _ in range(n)])

    def __call__(self, p, x, ctx):
        a = self.cv1(p["cv1"], x, ctx)
        for i, m in enumerate(self.m):
            a = m(p["m"][str(i)], a, ctx)
        b = self.cv2(p["cv2"], x, ctx)
        return self.cv3(p["cv3"], jnp.concatenate([a, b], -1), ctx)


class C3k(C3):
    """C3 with custom square bottleneck kernel (reference block.py:1114-1133)."""

    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5, k=3):
        super().__init__(c1, c2, n, shortcut, g, e, bottleneck_k=((k, k), (k, k)))


class C2f(Module):
    """Fast CSP bottleneck with 2 convs (reference block.py:293-318)."""

    def __init__(self, c1, c2, n=1, shortcut=False, g=1, e=0.5):
        super().__init__()
        self.c = int(c2 * e)
        self.n = n
        self.cv1 = Conv(c1, 2 * self.c, 1, 1)
        self.cv2 = Conv((2 + n) * self.c, c2, 1)
        self.m = ModuleList([Bottleneck(self.c, self.c, shortcut, g, k=((3, 3), (3, 3)), e=1.0) for _ in range(n)])

    def __call__(self, p, x, ctx):
        y = self.cv1(p["cv1"], x, ctx)
        ys = [y[..., : self.c], y[..., self.c :]]
        for i, m in enumerate(self.m):
            ys.append(m(p["m"][str(i)], ys[-1], ctx))
        return self.cv2(p["cv2"], jnp.concatenate(ys, -1), ctx)


class C3k2(C2f):
    """C2f whose inner blocks are C3k / Bottleneck / Bottleneck+PSABlock
    (reference block.py:1074-1111, incl. the attn variant)."""

    def __init__(self, c1, c2, n=1, c3k=False, e=0.5, attn=False, g=1, shortcut=True):
        super().__init__(c1, c2, n, shortcut, g, e)
        def inner():
            if attn:
                return ConvSeq(
                    Bottleneck(self.c, self.c, shortcut, g),
                    PSABlock(self.c, attn_ratio=0.5, num_heads=max(self.c // 64, 1)),
                )
            if c3k:
                return C3k(self.c, self.c, 2, shortcut, g)
            return Bottleneck(self.c, self.c, shortcut, g)

        self.m = ModuleList([inner() for _ in range(n)])


class SPPF(Module):
    """Spatial pyramid pooling, fast (reference block.py:213-243)."""

    def __init__(self, c1, c2, k=5, n=3, shortcut=False):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = Conv(c1, c_, 1, 1, act=False)
        self.cv2 = Conv(c_ * (n + 1), c2, 1, 1)
        self.k, self.n = k, n
        self.add = shortcut and c1 == c2

    def __call__(self, p, x, ctx):
        y = [self.cv1(p["cv1"], x, ctx)]
        for _ in range(self.n):
            y.append(max_pool(y[-1], self.k, 1))
        out = self.cv2(p["cv2"], jnp.concatenate(y, -1), ctx)
        return out + x if self.add else out


# ---------------------------------------------------------------------------
# Area attention (A2C2f family, the yolo-master transformer block)
# ---------------------------------------------------------------------------

class AAttn(Module):
    """Area-attention (reference block.py:1646-1733).

    Softmax attention over tokens of ``area``-partitioned feature map rows,
    with a 7x7 depthwise positional-encoding conv on V. Padding-free: H*W must
    be divisible by ``area`` (true for stride-32 features of 640 inputs).
    """

    def __init__(self, dim: int, num_heads: int, area: int = 1):
        super().__init__()
        self.area = area
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        ahd = self.head_dim * num_heads
        self.all_head_dim = ahd
        self.qkv = Conv(dim, ahd * 3, 1, act=False)
        self.proj = Conv(ahd, dim, 1, act=False)
        self.pe = Conv(ahd, ahd, 7, 1, 3, g=ahd, act=False)

    def __call__(self, p, x, ctx):
        B, H, W, _ = x.shape
        N = H * W
        hd, nh, ahd = self.head_dim, self.num_heads, self.all_head_dim
        qkv = self.qkv(p["qkv"], x, ctx).reshape(B, N, 3 * ahd)
        if self.area > 1:
            qkv = qkv.reshape(B * self.area, N // self.area, 3 * ahd)
        Bq, Nq = qkv.shape[0], qkv.shape[1]
        # torch: view(B,N,heads,head_dim*3) then split -> per-head q,k,v blocks
        qkv = qkv.reshape(Bq, Nq, nh, 3, hd)
        q, k, v = qkv[:, :, :, 0], qkv[:, :, :, 1], qkv[:, :, :, 2]  # [B,N,h,hd]
        # Logits stay in the compute dtype so the [B*area, h, N', N'] matrix is
        # never materialized in fp32 (HBM-bound: measured 3.56 ms -> 0.59 ms per
        # block at v0.1-L layer-7 shapes, scripts/bench_aattn.py); the softmax
        # itself still reduces in fp32 for stability. MXU accumulation is fp32
        # regardless of the requested output dtype.
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * (hd**-0.5), k)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        o = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
        o = o.reshape(Bq, Nq, ahd)
        v = v.reshape(Bq, Nq, ahd)
        if self.area > 1:
            o = o.reshape(B, N, ahd)
            v = v.reshape(B, N, ahd)
        o = o.reshape(B, H, W, ahd)
        v = v.reshape(B, H, W, ahd)
        o = o + self.pe(p["pe"], v, ctx)
        return self.proj(p["proj"], o, ctx)


class MLPBlock(ConvSeq):
    """1x1 conv MLP used inside ABlock: Conv(act) -> Conv(no act)."""

    def __init__(self, dim, hidden):
        super().__init__(Conv(dim, hidden, 1), Conv(hidden, dim, 1, act=False))


class ABlock(Module):
    """Area-attention block: x + attn(x); x + mlp(x) (reference block.py:1735-1798)."""

    def __init__(self, dim, num_heads, mlp_ratio=1.2, area=1):
        super().__init__()
        self.attn = AAttn(dim, num_heads=num_heads, area=area)
        hidden = int(dim * mlp_ratio)
        self.mlp = MLPBlock(dim, hidden)

    def init(self, key) -> Params:
        p = super().init(key)
        # reference re-inits all convs in the block with trunc_normal(0.02)
        p = _trunc_normal_convs(p, key)
        return p

    def __call__(self, p, x, ctx):
        x = x + self.attn(p["attn"], x, ctx)
        return x + self.mlp(p["mlp"], x, ctx)


def _trunc_normal_convs(p, key):
    leaves_paths = []

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        else:
            leaves_paths.append(path)

    walk(p, ())
    keys = jax.random.split(key, max(len(leaves_paths), 1))
    out = jax.tree_util.tree_map(lambda x: x, p)

    def set_in(node, path, val):
        for k in path[:-1]:
            node = node[k]
        node[path[-1]] = val

    for path, k in zip(leaves_paths, keys):
        if path[-1] == "w":
            node = out
            for kk in path[:-1]:
                node = node[kk]
            node["w"] = trunc_normal(k, node["w"].shape, 0.02)
    return out


class A2C2f(Module):
    """Area-attention C2f (reference block.py:1800-1893)."""

    def __init__(self, c1, c2, n=1, a2=True, area=1, residual=False, mlp_ratio=2.0, e=0.5, g=1, shortcut=True):
        super().__init__()
        c_ = int(c2 * e)
        assert c_ % 32 == 0, "A2C2f hidden dim must be a multiple of 32"
        self.c2 = c2
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv((1 + n) * c_, c2, 1)
        self.residual = a2 and residual
        self.m = ModuleList(
            [
                ConvSeq(*[ABlock(c_, c_ // 32, mlp_ratio, area) for _ in range(2)])
                if a2
                else C3k(c_, c_, 2, shortcut, g)
                for _ in range(n)
            ]
        )

    def init(self, key) -> Params:
        p = super().init(key)
        if self.residual:
            p["gamma"] = 0.01 * jnp.ones((self.c2,), jnp.float32)
        return p

    def __call__(self, p, x, ctx):
        ys = [self.cv1(p["cv1"], x, ctx)]
        for i, m in enumerate(self.m):
            ys.append(m(p["m"][str(i)], ys[-1], ctx))
        y = self.cv2(p["cv2"], jnp.concatenate(ys, -1), ctx)
        if self.residual:
            return x + p["gamma"].astype(y.dtype) * y
        return y


# ---------------------------------------------------------------------------
# PSA attention family (used by C2PSA configs and C3k2 attn variants)
# ---------------------------------------------------------------------------

class Attention(Module):
    """Multi-head attention on 2D maps with extra 3x3 dw positional conv
    (reference block.py PSA Attention)."""

    def __init__(self, dim, num_heads=8, attn_ratio=0.5):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.key_dim = int(self.head_dim * attn_ratio)
        self.scale = self.key_dim**-0.5
        nh_kd = self.key_dim * num_heads
        h = dim + nh_kd * 2
        self.h = h
        self.dim = dim
        self.qkv = Conv(dim, h, 1, act=False)
        self.proj = Conv(dim, dim, 1, act=False)
        self.pe = Conv(dim, dim, 3, 1, g=dim, act=False)

    def __call__(self, p, x, ctx):
        B, H, W, C = x.shape
        N = H * W
        qkv = self.qkv(p["qkv"], x, ctx).reshape(B, N, self.num_heads, self.key_dim * 2 + self.head_dim)
        q, k, v = jnp.split(qkv, [self.key_dim, 2 * self.key_dim], axis=-1)
        # bf16 logits + fp32 softmax reduction — see AAttn above for rationale.
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * self.scale, k)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        o = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, H, W, C)
        vmap = v.reshape(B, H, W, C)
        o = o + self.pe(p["pe"], vmap, ctx)
        return self.proj(p["proj"], o, ctx)


class PSABlock(Module):
    """Attention + 2-conv FFN with residuals (reference block.py PSABlock)."""

    def __init__(self, c, attn_ratio=0.5, num_heads=4, shortcut=True):
        super().__init__()
        self.attn = Attention(c, num_heads=num_heads, attn_ratio=attn_ratio)
        self.ffn = ConvSeq(Conv(c, c * 2, 1), Conv(c * 2, c, 1, act=False))
        self.add = shortcut

    def __call__(self, p, x, ctx):
        y = self.attn(p["attn"], x, ctx)
        x = x + y if self.add else y
        y = self.ffn(p["ffn"], x, ctx)
        return x + y if self.add else y


class C2PSA(Module):
    """CSP wrapper around PSABlocks (reference block.py:1441+)."""

    def __init__(self, c1, c2, n=1, e=0.5):
        super().__init__()
        assert c1 == c2
        self.c = int(c1 * e)
        self.cv1 = Conv(c1, 2 * self.c, 1, 1)
        self.cv2 = Conv(2 * self.c, c1, 1)
        self.m = ModuleList([PSABlock(self.c, 0.5, self.c // 64 if self.c >= 64 else 1) for _ in range(n)])

    def __call__(self, p, x, ctx):
        y = self.cv1(p["cv1"], x, ctx)
        a, b = y[..., : self.c], y[..., self.c :]
        for i, m in enumerate(self.m):
            b = m(p["m"][str(i)], b, ctx)
        return self.cv2(p["cv2"], jnp.concatenate([a, b], -1), ctx)


# ---------------------------------------------------------------------------
# Graph plumbing modules
# ---------------------------------------------------------------------------

class Concat(Module):
    """Concat along channels (reference conv.py:616). Input: list of NHWC."""

    def __init__(self, dim=1):
        super().__init__()

    def init(self, key):
        return {}

    def __call__(self, p, xs, ctx):
        return jnp.concatenate(xs, -1)


class Upsample(Module):
    """nn.Upsample(None, 2, 'nearest') analog."""

    def __init__(self, size=None, scale=2, mode="nearest"):
        super().__init__()
        assert mode == "nearest"
        self.scale = int(scale)

    def init(self, key):
        return {}

    def __call__(self, p, x, ctx):
        return upsample_nearest(x, self.scale)


class MaxPool(Module):
    def __init__(self, k=2, s=2):
        super().__init__()
        self.k, self.s = k, s

    def init(self, key):
        return {}

    def __call__(self, p, x, ctx):
        return max_pool(x, self.k, self.s, padding=0)


def get_safe_groups(channels: int, groups: int = 8) -> int:
    """Largest group count <= groups dividing channels (reference moe/experts.py)."""
    g = min(groups, channels)
    while g > 1 and channels % g:
        g -= 1
    return max(g, 1)


class GroupNorm(Module):
    """GroupNorm over NHWC channels — used by MoE experts for single-sample
    stability after top-k routing (reference moe/experts.py:76-84)."""

    def __init__(self, c: int, groups: int = 8, eps: float = 1e-5):
        super().__init__()
        self.c = c
        self.groups = get_safe_groups(c, groups)
        self.eps = eps

    def init(self, key) -> Params:
        return {"scale": jnp.ones((self.c,), jnp.float32), "bias": jnp.zeros((self.c,), jnp.float32)}

    def __call__(self, p: Params, x, ctx: Context):
        B = x.shape[0]
        spatial = x.shape[1:-1]
        g = self.groups
        xf = x.astype(jnp.float32).reshape(B, -1, g, self.c // g)
        mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
        var = jnp.var(xf, axis=(1, 3), keepdims=True)
        xf = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        xf = xf.reshape(B, *spatial, self.c)
        return (xf * p["scale"] + p["bias"]).astype(x.dtype)


class PlainConv(Module):
    """Bare conv2d without norm/act (torch nn.Conv2d analog), optional bias."""

    def __init__(self, c1, c2, k=1, s=1, p=None, g=1, bias=False, dilation=1):
        super().__init__()
        self.c1, self.c2, self.k, self.s, self.g = c1, c2, k, s, g
        self.dilation = dilation
        # dilated 'same' padding: d*(k-1)//2 (torch padding=dilation for k=3)
        self.p = autopad(k, p) if dilation == 1 else dilation * (k - 1) // 2
        self.bias = bias

    def init(self, key) -> Params:
        from .module import conv_bias_uniform

        k1, k2 = jax.random.split(key)
        out = {"w": kaiming_uniform_conv(k1, (self.k, self.k, self.c1 // self.g, self.c2))}
        if self.bias:
            out["b"] = conv_bias_uniform(k2, self.k * self.k * self.c1 // self.g, self.c2)
        return out

    def __call__(self, p: Params, x, ctx: Context):
        y = conv2d(x, p["w"], stride=self.s, padding=self.p, groups=self.g, dilation=self.dilation)
        if "b" in p:
            y = y + p["b"].astype(y.dtype)
        return y


def avg_pool(x, k: int, stride: int = None):
    s = stride or k
    return lax.reduce_window(
        x.astype(jnp.float32), 0.0, lax.add,
        (1, k, k, 1), (1, s, s, 1), "VALID",
    ).astype(x.dtype) / (k * k)


class Linear(Module):
    """Dense layer [..., in] -> [..., out] (torch nn.Linear analog)."""

    def __init__(self, c1, c2, bias=True):
        super().__init__()
        self.c1, self.c2, self.has_bias = c1, c2, bias

    def init(self, key) -> Params:
        from .module import conv_bias_uniform

        k1, k2 = jax.random.split(key)
        bound = 1.0 / math.sqrt(self.c1)
        out = {"w": jax.random.uniform(k1, (self.c1, self.c2), jnp.float32, -bound, bound)}
        if self.has_bias:
            out["b"] = conv_bias_uniform(k2, self.c1, self.c2)
        return out

    def __call__(self, p: Params, x, ctx: Context):
        y = x @ p["w"].astype(x.dtype)
        if "b" in p:
            y = y + p["b"].astype(y.dtype)
        return y


class LayerNorm(Module):
    """LayerNorm over the last axis (torch nn.LayerNorm analog)."""

    def __init__(self, c, eps=1e-5):
        super().__init__()
        self.c, self.eps = c, eps

    def init(self, key) -> Params:
        return {"scale": jnp.ones((self.c,), jnp.float32), "bias": jnp.zeros((self.c,), jnp.float32)}

    def __call__(self, p: Params, x, ctx: Context):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, -1, keepdims=True)
        var = jnp.var(xf, -1, keepdims=True)
        y = (xf - mean) * lax.rsqrt(var + self.eps)
        return (y * p["scale"] + p["bias"]).astype(x.dtype)


# ---------------------------------------------------------------------------
# HGNetV2 backbone blocks + AIFI encoder (the RT-DETR backbone/encoder family,
# reference nn/modules/block.py:110 HGStem/HGBlock, conv.py LightConv,
# transformer.py AIFI). All ReLU-activated per PPHGNetV2.
# ---------------------------------------------------------------------------

class HGStem(Module):
    """PPHGNetV2 stem: 5 convs + a stride-1 maxpool branch (block.py:110).

    Downsamples 4x: stem1 s2 -> parallel {maxpool, stem2a+stem2b} -> concat
    -> stem3 s2 -> stem4 1x1.
    """

    def __init__(self, c1, cm, c2):
        super().__init__()
        self.stem1 = Conv(c1, cm, 3, 2, act="relu")
        self.stem2a = Conv(cm, cm // 2, 2, 1, 0, act="relu")
        self.stem2b = Conv(cm // 2, cm, 2, 1, 0, act="relu")
        self.stem3 = Conv(cm * 2, cm, 3, 2, act="relu")
        self.stem4 = Conv(cm, c2, 1, 1, act="relu")

    def __call__(self, p, x, ctx):
        x = self.stem1(p["stem1"], x, ctx)
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))  # F.pad [0,1,0,1]
        x2 = self.stem2a(p["stem2a"], x, ctx)
        x2 = jnp.pad(x2, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x2 = self.stem2b(p["stem2b"], x2, ctx)
        x1 = max_pool(x, 2, 1, padding=0)  # ceil_mode covered by the pre-pad
        x = jnp.concatenate([x1, x2], -1)
        x = self.stem3(p["stem3"], x, ctx)
        return self.stem4(p["stem4"], x, ctx)


class LightConv(Module):
    """1x1 conv (no act) + DW kxk conv (ReLU) (reference conv.py LightConv)."""

    def __init__(self, c1, c2, k=3):
        super().__init__()
        self.conv1 = Conv(c1, c2, 1, act=False)
        self.conv2 = DWConv(c2, c2, k, act="relu")

    def __call__(self, p, x, ctx):
        return self.conv2(p["conv2"], self.conv1(p["conv1"], x, ctx), ctx)


class HGBlock(Module):
    """PPHGNetV2 HG_Block: n chained (Light)Convs, dense concat, then
    squeeze (1x1 -> c2/2) + excitation (1x1 -> c2) convs; optional residual
    (reference block.py HGBlock)."""

    def __init__(self, c1, cm, c2, k=3, n=6, lightconv=False, shortcut=False):
        super().__init__()
        block = LightConv if lightconv else (lambda a, b, kk: Conv(a, b, kk, act="relu"))
        self.m = ModuleList([block(c1 if i == 0 else cm, cm, k) for i in range(n)])
        self.sc = Conv(c1 + n * cm, c2 // 2, 1, 1, act="relu")
        self.ec = Conv(c2 // 2, c2, 1, 1, act="relu")
        self.add = shortcut and c1 == c2

    def __call__(self, p, x, ctx):
        ys = [x]
        for i, m in enumerate(self.m):
            ys.append(m(p["m"][str(i)], ys[-1], ctx))
        y = self.ec(p["ec"], self.sc(p["sc"], jnp.concatenate(ys, -1), ctx), ctx)
        return y + x if self.add else y


class TorchMHA(Module):
    """Multi-head attention with the torch ``nn.MultiheadAttention`` param
    layout — leaves ``in_proj_weight`` [D,3D], ``in_proj_bias`` [3D] and an
    ``out_proj`` Linear — so reference checkpoints import mechanically
    (reference transformer.py TransformerEncoderLayer.ma and
    DeformableTransformerDecoderLayer.self_attn)."""

    def __init__(self, d, num_heads):
        super().__init__()
        self.d, self.nh, self.hd = d, num_heads, d // num_heads
        self.out_proj = Linear(d, d)

    def init(self, key) -> Params:
        p = super().init(key)
        k1, _ = jax.random.split(key)
        # torch init: xavier_uniform in_proj, zero biases
        bound = math.sqrt(6.0 / (self.d + 3 * self.d))
        p["in_proj_weight"] = jax.random.uniform(k1, (self.d, 3 * self.d), jnp.float32, -bound, bound)
        p["in_proj_bias"] = jnp.zeros((3 * self.d,), jnp.float32)
        p["out_proj"]["b"] = jnp.zeros_like(p["out_proj"]["b"])
        return p

    def __call__(self, p, q, k, v, ctx, mask=None):
        """q/k/v: [B, N, D] / [B, M, D]. mask: additive [N, M] fp32 bias."""
        B, N, D = q.shape
        w = p["in_proj_weight"].astype(q.dtype)
        b = p["in_proj_bias"].astype(q.dtype)

        def heads(t):
            return t.reshape(B, -1, self.nh, self.hd).transpose(0, 2, 1, 3)

        qh = heads(q @ w[:, :D] + b[:D])
        kh = heads(k @ w[:, D : 2 * D] + b[D : 2 * D])
        vh = heads(v @ w[:, 2 * D :] + b[2 * D :])
        # bf16 logits + fp32 softmax reduction — see AAttn above for rationale.
        attn = jnp.einsum("bhnd,bhmd->bhnm", qh * self.hd**-0.5, kh)
        if mask is not None:
            attn = attn + mask.astype(attn.dtype)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(vh.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh).transpose(0, 2, 1, 3).reshape(B, N, D)
        return self.out_proj(p["out_proj"], out, ctx)


class AIFI(Module):
    """Attention-based Intra-scale Feature Interaction: one post-norm
    transformer encoder layer with 2D sincos position embedding over the P5
    map (reference transformer.py AIFI / TransformerEncoderLayer). Param
    names mirror the torch module (ma/fc1/fc2/norm1/norm2) for checkpoint
    import."""

    def __init__(self, c1, cm=2048, num_heads=8):
        super().__init__()
        self.c, self.nh = c1, num_heads
        self.ma = TorchMHA(c1, num_heads)
        self.fc1 = Linear(c1, cm)
        self.fc2 = Linear(cm, c1)
        self.norm1 = LayerNorm(c1)
        self.norm2 = LayerNorm(c1)

    @staticmethod
    def pos_embed_2d(h, w, dim, temperature=10000.0):
        """[h*w, dim] 2D sine-cosine position embedding, replicating the
        reference bit-for-bit (build_2d_sincos_position_embedding,
        transformer.py:214-244) — including its w-major flatten of the
        (w, h) meshgrid, which pairs pos rows with h-major tokens in the
        reference's own order."""
        gw, gh = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32), jnp.arange(h, dtype=jnp.float32), indexing="ij")
        pos_dim = dim // 4
        omega = 1.0 / temperature ** (jnp.arange(pos_dim, dtype=jnp.float32) / pos_dim)
        out_w = gw.reshape(-1)[:, None] * omega[None]
        out_h = gh.reshape(-1)[:, None] * omega[None]
        return jnp.concatenate([jnp.sin(out_w), jnp.cos(out_w), jnp.sin(out_h), jnp.cos(out_h)], -1)

    def __call__(self, p, x, ctx):
        B, H, W, C = x.shape
        t = x.reshape(B, H * W, C)
        pe = self.pos_embed_2d(H, W, C).astype(t.dtype)[None]
        qk = t + pe
        sa = self.ma(p["ma"], qk, qk, t, ctx)
        t = self.norm1(p["norm1"], t + sa, ctx)
        ff = self.fc2(p["fc2"], jax.nn.gelu(self.fc1(p["fc1"], t, ctx)), ctx)
        t = self.norm2(p["norm2"], t + ff, ctx)
        return t.reshape(B, H, W, C)


class RepConv(Module):
    """RepVGG-style conv: parallel 3x3 + 1x1 (+BN each) summed, SiLU
    (reference conv.py RepConv, train-time form; deploy fusion folds branches)."""

    def __init__(self, c1, c2, k=3, s=1, act=True):
        super().__init__()
        assert k == 3
        self.conv1 = Conv(c1, c2, 3, s, act=False)
        self.conv2 = Conv(c1, c2, 1, s, act=False)
        self.act = act

    def __call__(self, p, x, ctx):
        y = self.conv1(p["conv1"], x, ctx) + self.conv2(p["conv2"], x, ctx)
        return silu(y) if self.act else y


class RepC3(Module):
    """CSP block with RepConv inner stack (reference block.py RepC3) — the
    RT-DETR CCFM fusion block."""

    def __init__(self, c1, c2, n=3, e=1.0):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv(c1, c_, 1, 1)
        self.m = ModuleList([RepConv(c_, c_) for _ in range(n)])
        self.cv3 = Conv(c_, c2, 1, 1) if c_ != c2 else None

    def __call__(self, p, x, ctx):
        y = self.cv1(p["cv1"], x, ctx)
        for i, m in enumerate(self.m):
            y = m(p["m"][str(i)], y, ctx)
        y = y + self.cv2(p["cv2"], x, ctx)
        return self.cv3(p["cv3"], y, ctx) if self.cv3 is not None else y
