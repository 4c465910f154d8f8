"""Expert library for ES-MoE (reference: ultralytics/nn/modules/moe/experts.py).

The v0 paper block uses heterogeneous ``EfficientExpertGroup`` experts —
depthwise-separable convs with growing kernels 3/5/7/... (experts.py:278-308).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..layers import BatchNorm, conv2d, silu
from ..module import Context, Module, Params, kaiming_uniform_conv


class DepthwiseSeparableConv(Module):
    """dw-conv(k) -> pw-conv(1) -> BN -> SiLU (reference experts.py:278-293)."""

    def __init__(self, c1: int, c2: int, k: int, s: int = 1):
        super().__init__()
        self.c1, self.c2, self.k, self.s = c1, c2, k, s
        self.pad = (k - 1) // 2
        self.bn = BatchNorm(c2)

    def init(self, key) -> Params:
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "depthwise": {"w": kaiming_uniform_conv(k1, (self.k, self.k, 1, self.c1))},
            "pointwise": {"w": kaiming_uniform_conv(k2, (1, 1, self.c1, self.c2))},
            "bn": self.bn.init(k3),
        }

    def __call__(self, p: Params, x, ctx: Context):
        y = conv2d(x, p["depthwise"]["w"], stride=self.s, padding=self.pad, groups=self.c1)
        y = conv2d(y, p["pointwise"]["w"])
        if "b" in p["pointwise"]:  # deploy-fused form (utils/fuse.py)
            y = y + p["pointwise"]["b"].astype(y.dtype)
        elif "bn" in p:
            y = self.bn(p["bn"], y, ctx)
        return silu(y)


class EfficientExpertGroup(Module):
    """One expert = one depthwise-separable conv (reference experts.py:296-308)."""

    def __init__(self, c1: int, c2: int, kernel_size: int, stride: int = 1):
        super().__init__()
        self.conv = DepthwiseSeparableConv(c1, c2, kernel_size, stride)

    def __call__(self, p: Params, x, ctx: Context):
        return self.conv(p["conv"], x, ctx)
