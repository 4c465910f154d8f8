"""Micro-bench the AAttn/ABlock components at v0.1-L layer-7 shapes.

Layer 7 of v0.1-L: A2C2f(512, 512, n=4, a2=True, area=4) at 40x40, bs=16
-> 8 ABlocks of dim 256, heads 8, area 4. Attributes the 36 ms layer delta
seen in runs/bench/sweep_v01l_layers.json to its sub-ops.

Methodology: chained fori_loop with a data dependence between iterations
(same relay-safe scheme as bench.py / perf_sweep.py) — independent repeated
dispatches of the same computation are NOT reliable on the axon relay.
"""
import time

import jax
import jax.numpy as jnp

from yolo_master_tpu.nn.layers import A2C2f, AAttn, ABlock, Conv
from yolo_master_tpu.nn.module import Context

B, H, W, C = 16, 40, 40, 256
AREA, NH = 4, 8
DTYPE = jnp.bfloat16
REPS = (1, 13)


def timeit(name, fn, p, x, n=5):
    @jax.jit
    def run(p, x0, reps):
        def body(i, carry):
            x, acc = carry
            y = fn(p, x)
            s = y.sum().astype(jnp.float32)
            return x0 + (s * 1e-9).astype(x0.dtype), acc + s

        return jax.lax.fori_loop(0, reps, body, (x0, jnp.zeros((), jnp.float32)))[1]

    def t(r):
        float(run(p, x, r))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(run(p, x, r))
            ts.append((time.perf_counter() - t0) * 1e3)
        ts.sort()
        return ts[len(ts) // 2]

    lo, hi = REPS
    dt = (t(hi) - t(lo)) / (hi - lo)
    print(f"{name:46s} {dt:9.4f} ms", flush=True)
    return dt


def cast(p):
    return jax.tree.map(lambda a: a.astype(DTYPE) if a.dtype == jnp.float32 else a, p)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, C), DTYPE)
    x512 = jax.random.normal(key, (B, H, W, 512), DTYPE)
    ctx = Context(training=False)

    full = A2C2f(512, 512, n=4, a2=True, area=AREA)
    timeit("A2C2f full layer-7 (512->512 n=4)", lambda p, x: full(p, x, ctx), cast(full.init(key)), x512)

    blk = ABlock(C, NH, mlp_ratio=2.0, area=AREA)
    timeit("ABlock", lambda p, x: blk(p, x, ctx), cast(blk.init(key)), x)

    attn = AAttn(C, num_heads=NH, area=AREA)
    timeit("AAttn", lambda p, x: attn(p, x, ctx), cast(attn.init(key)), x)

    qkv = Conv(C, C * 3, 1, act=False)
    timeit("qkv 1x1 conv C->3C", lambda p, x: qkv(p, x, ctx)[..., :C], cast(qkv.init(key)), x)

    pe = Conv(C, C, 7, 1, 3, g=C, act=False)
    timeit("pe 7x7 dw conv", lambda p, x: pe(p, x, ctx), cast(pe.init(key)), x)

    proj = Conv(C, C, 1, act=False)
    timeit("proj 1x1 conv", lambda p, x: proj(p, x, ctx), cast(proj.init(key)), x)

    mlp1, mlp2 = Conv(C, 2 * C, 1), Conv(2 * C, C, 1, act=False)
    p12 = {"a": cast(mlp1.init(key)), "b": cast(mlp2.init(key))}
    timeit("mlp (2 convs, ratio 2)", lambda p, x: mlp2(p["b"], mlp1(p["a"], x, ctx), ctx), p12, x)

    # attention core at the area-reshaped shape
    N = H * W
    Bq, Nq = B * AREA, N // AREA
    hd = C // NH
    qkv_x = jax.random.normal(key, (Bq, Nq, NH, 3, hd), DTYPE)

    def attn_core(qkv):
        q, k, v = qkv[:, :, :, 0], qkv[:, :, :, 1], qkv[:, :, :, 2]
        a = jnp.einsum("bnhd,bmhd->bhnm", q * (hd**-0.5), k, preferred_element_type=jnp.float32)
        a = jax.nn.softmax(a, axis=-1).astype(qkv.dtype)
        return jnp.einsum("bhnm,bmhd->bnhd", a, v)

    timeit("attn core (fp32 logits)", lambda p, x: attn_core(x), {}, qkv_x)

    def attn_core_bf16(qkv):
        q, k, v = qkv[:, :, :, 0], qkv[:, :, :, 1], qkv[:, :, :, 2]
        a = jnp.einsum("bnhd,bmhd->bhnm", q * (hd**-0.5), k)
        a = jax.nn.softmax(a.astype(jnp.float32), axis=-1).astype(qkv.dtype)
        return jnp.einsum("bhnm,bmhd->bnhd", a, v)

    timeit("attn core (bf16 logits, fp32 softmax)", lambda p, x: attn_core_bf16(x), {}, qkv_x)


if __name__ == "__main__":
    main()
