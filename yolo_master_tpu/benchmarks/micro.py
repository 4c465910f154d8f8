"""Dispatch micro-benchmarks for the mixture families.

Analog of the reference's ``benchmarks/benchmark_mot_dispatch.py`` and
``benchmark_molora_dispatch.py``: time the dense (compute-all-experts) path
against the sparse (top-k masked) path of a single routed block on tiny
shapes, and report the per-call time plus the max output gap. On TPU both
paths are static-shape jitted graphs, so "sparse" here means masked/renormed
top-k mixing — the interesting question the micro-bench answers is what the
masking costs or saves *after* XLA fusion, per block, without building a
whole model.

CLI:  python -m yolo_master_tpu.benchmarks.micro [--steps 20] [--batch 8] [--size 32]
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp

from ..nn.module import Context

__all__ = ["bench_mot_dispatch", "bench_molora_dispatch", "bench_esmoe_dispatch"]


def _time_jitted(fn, *args, steps: int = 20) -> float:
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps * 1e3


def bench_mot_dispatch(steps: int = 20, batch: int = 8, size: int = 32, ch: int = 32) -> Dict[str, float]:
    """MoT dense vs sparse-masked dispatch (reference benchmark_mot_dispatch)."""
    from ..nn.mot import MoTBlock

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, size, size, ch))
    out: Dict[str, float] = {}
    blocks = {}
    for sparse in (False, True):
        block = MoTBlock(ch, num_heads=4, top_k=1, sparse_train=sparse).finalize("mot")
        p = block.init(jax.random.PRNGKey(0))
        fn = jax.jit(lambda p, x, b=block: b(p, x, Context(training=False)))
        out[f"{'sparse' if sparse else 'dense'}_ms"] = _time_jitted(fn, p, x, steps=steps)
        blocks[sparse] = (block, p)
    b0, p0 = blocks[False]
    b1, p1 = blocks[True]
    y0 = b0(p0, x, Context(training=False))
    y1 = b1(p1, x, Context(training=False))
    out["output_gap"] = float(jnp.abs(jnp.asarray(y0) - jnp.asarray(y1)).max())
    return out


def bench_molora_dispatch(steps: int = 20, batch: int = 8, size: int = 16, ch: int = 16,
                          num_experts: int = 4, rank: int = 4) -> Dict[str, float]:
    """MoLoRA routed-adapter dispatch: base conv alone vs conv+routed adapters
    (reference benchmark_molora_dispatch)."""
    from ..peft.molora import MoLoRAConfig, RoutedMoLoRAConv

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, size, size, ch))
    kernel = (3, 3, ch, ch)
    w = jax.random.normal(jax.random.PRNGKey(1), kernel) * 0.05

    def base(x):
        return jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    cfg = MoLoRAConfig(r=rank, num_experts=num_experts, top_k=2)
    mol = RoutedMoLoRAConv(kernel, cfg)
    ap = mol.init(jax.random.PRNGKey(2))
    base_j = jax.jit(base)
    routed_j = jax.jit(lambda ap, x: base(x) + mol.delta(ap, x)[0])
    return {
        "base_ms": _time_jitted(base_j, x, steps=steps),
        "routed_ms": _time_jitted(routed_j, ap, x, steps=steps),
    }


def bench_esmoe_dispatch(steps: int = 20, batch: int = 8, size: int = 32, ch: int = 32,
                         num_experts: int = 4) -> Dict[str, float]:
    """ES_MOE dense vs gathered-sparse eval dispatch."""
    from ..nn.moe.es_moe import ES_MOE

    x = jax.random.normal(jax.random.PRNGKey(0), (batch, size, size, ch))
    block = ES_MOE(ch, ch, num_experts=num_experts, top_k=2).finalize("esmoe")
    p = block.init(jax.random.PRNGKey(1))
    dense = jax.jit(lambda p, x: block(p, x, Context(training=False, sparse_inference=False)))
    sparse = jax.jit(lambda p, x: block(p, x, Context(training=False, sparse_inference=True)))
    return {
        "dense_ms": _time_jitted(dense, p, x, steps=steps),
        "sparse_ms": _time_jitted(sparse, p, x, steps=steps),
    }


def main(argv=None) -> int:
    import argparse
    import json

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--which", choices=["mot", "molora", "esmoe", "all"], default="all")
    args = ap.parse_args(argv)
    out = {}
    if args.which in ("mot", "all"):
        out["mot"] = bench_mot_dispatch(args.steps, args.batch, args.size)
    if args.which in ("molora", "all"):
        out["molora"] = bench_molora_dispatch(args.steps, args.batch, max(args.size // 2, 8))
    if args.which in ("esmoe", "all"):
        out["esmoe"] = bench_esmoe_dispatch(args.steps, args.batch, args.size)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
