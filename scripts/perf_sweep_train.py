#!/usr/bin/env python3
"""Train-step perf attribution (VERDICT r3 item 3 / weak #2).

Decomposes the bs=64 bf16 training step (the BENCH train row, bench.py
train_row) into measured stages so the gap between inference throughput and
train throughput is attributable, and measures the candidate fixes:

  stages:  model forward (train-mode, BN updates)
        -> + v8 loss (TAL assign + DFL/CIoU/BCE)
        -> + backward (value_and_grad)
        -> + optimizer update (SGD+nesterov+decay+clip)
        -> + EMA (the full bench row step)
  knobs:   remat (jax.checkpoint) of the loss, max_gt (TAL candidate count),
           EMA on/off, fp32 vs bf16 compute.

Methodology identical to bench.py: K chained iterations inside one jit with a
data dependence between iterations (relay-safe), (T(K)-T(1))/(K-1).

Usage: python scripts/perf_sweep_train.py [--bs 64] [--imgsz 640]
CPU smoke: --cpu --tiny.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolo-master-n",
                    help="model yaml name (e.g. yolo-master-v0_1-s, yolo-master-v0_10-s)")
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--max-gt", type=int, default=32)
    ap.add_argument("--out", default="runs/bench/perf_sweep_train.json")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from yolo_master_tpu.engine.train_step import make_optimizer, make_train_state, make_train_step
    from yolo_master_tpu.nn.module import Context
    from yolo_master_tpu.nn.tasks import DetectionModel
    from yolo_master_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    bs = 2 if args.tiny else args.bs
    imgsz = 160 if args.tiny else args.imgsz
    max_gt = 8 if args.tiny else args.max_gt
    reps = (1, 3) if args.tiny else (1, 6)
    hyp = {"box": 7.5, "cls": 0.5, "dfl": 1.5, "moe": 0.01}

    model = DetectionModel(args.model)
    params0 = model.init_params(0)
    tx = make_optimizer(0.01, params=params0)

    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.random((bs, imgsz, imgsz, 3), np.float32)),
        "boxes": jnp.asarray(rng.uniform(10, imgsz - 40, (bs, max_gt, 4)).astype(np.float32)),
        "classes": jnp.asarray(rng.integers(0, 80, (bs, max_gt)), jnp.int32),
        "mask": jnp.ones((bs, max_gt), bool),
    }

    def loss_fn(params, b, compute_dtype=jnp.bfloat16):
        ctx = Context(training=True, compute_dtype=compute_dtype, step=jnp.zeros((), jnp.int32), gt=b)
        preds = model.forward_train(params, b["images"].astype(compute_dtype), ctx)
        total, _ = model.compute_loss(preds, b, ctx.total_aux(), hyp)
        return total

    # ---- stage functions: (params, batch) -> scalar ------------------------
    def fwd_only(params, b):
        ctx = Context(training=True, compute_dtype=jnp.bfloat16, step=jnp.zeros((), jnp.int32), gt=b)
        preds = model.forward_train(params, b["images"].astype(jnp.bfloat16), ctx)
        return sum(
            p.sum().astype(jnp.float32)
            for p in jax.tree_util.tree_leaves(preds)
            if hasattr(p, "sum")
        )

    def fwd_loss(params, b):
        return loss_fn(params, b)

    def fwd_bwd(params, b):
        total, grads = jax.value_and_grad(loss_fn)(params, b)
        return total + optax.global_norm(grads) * 1e-9

    def fwd_bwd_remat(params, b):
        total, grads = jax.value_and_grad(jax.checkpoint(loss_fn))(params, b)
        return total + optax.global_norm(grads) * 1e-9

    def chained(stage_fn):
        @partial(jax.jit, static_argnames=("reps",))
        def run(params, b, reps):
            def body(i, carry):
                bb, acc = carry
                s = stage_fn(params, bb)
                bb = dict(bb)
                bb["images"] = b["images"] + (s * 1e-12).astype(b["images"].dtype)
                return bb, acc + s.astype(jnp.float32)

            return jax.lax.fori_loop(0, reps, body, (b, jnp.zeros((), jnp.float32)))[1]

        return run

    def timed_stage(stage_fn, n=3):
        run = chained(stage_fn)
        lo, hi = reps

        def t(r):
            float(run(params0, batch, r))
            ts = []
            for _ in range(n):
                t0 = time.perf_counter()
                float(run(params0, batch, r))
                ts.append((time.perf_counter() - t0) * 1e3)
            ts.sort()
            return ts[len(ts) // 2]

        return (t(hi) - t(lo)) / (hi - lo)

    def timed_step(ema_on=True, remat=False, accumulate=1, n=3):
        """Full train step via make_train_step (state-carried chain, like
        bench.py train_row)."""
        raw = make_train_step(
            model, tx=tx, imgsz=imgsz, batch_per_step=bs, max_gt=max_gt,
            compute_dtype=jnp.bfloat16, ema_on=ema_on, accumulate=accumulate,
            jit_compile=False, remat=remat,
        )
        state = make_train_state(model, seed=0, tx=tx)

        @partial(jax.jit, static_argnames=("reps",))
        def run(state, b, reps):
            def body(i, st):
                st, _ = raw(st, b)
                return st
            st = jax.lax.fori_loop(0, reps, body, state)
            # force the FULL state (ema_updates alone lets XLA dead-code the
            # whole loop when ema_on=False — observed as a negative stage time)
            return optax.global_norm(st.params) + st.ema_updates

        lo, hi = reps

        def t(r):
            float(run(state, batch, r))
            ts = []
            for _ in range(n):
                t0 = time.perf_counter()
                float(run(state, batch, r))
                ts.append((time.perf_counter() - t0) * 1e3)
            ts.sort()
            return ts[len(ts) // 2]

        return (t(hi) - t(lo)) / (hi - lo)

    out = {"model": args.model, "bs": bs, "imgsz": imgsz, "max_gt": max_gt,
           "backend": jax.devices()[0].platform}

    def rec(key, ms):
        out[key] = round(ms, 2)
        out[key + "_img_per_s"] = round(bs / ms * 1000, 1)
        print(f"{key}: {ms:.2f} ms  ({bs / ms * 1000:.1f} img/s)")

    rec("fwd_train_ms", timed_stage(fwd_only))
    rec("fwd_loss_ms", timed_stage(fwd_loss))
    rec("fwd_bwd_ms", timed_stage(fwd_bwd))
    rec("fwd_bwd_remat_ms", timed_stage(fwd_bwd_remat))
    rec("step_full_ms", timed_step(ema_on=True))
    rec("step_no_ema_ms", timed_step(ema_on=False))
    rec("step_remat_ms", timed_step(ema_on=True, remat=True))

    # TAL cost: loss at a different gt budget
    small_gt = max(4, max_gt // 4)
    b2 = dict(batch)
    b2["boxes"], b2["classes"], b2["mask"] = (
        batch["boxes"][:, :small_gt], batch["classes"][:, :small_gt], batch["mask"][:, :small_gt])
    run = chained(fwd_loss)
    lo, hi = reps
    float(run(params0, b2, lo))

    def t(r, b):
        float(run(params0, b, r))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(params0, b, r))
            ts.append((time.perf_counter() - t0) * 1e3)
        ts.sort()
        return ts[len(ts) // 2]

    out[f"fwd_loss_gt{small_gt}_ms"] = round((t(hi, b2) - t(lo, b2)) / (hi - lo), 2)
    print(f"fwd_loss_gt{small_gt}_ms: {out[f'fwd_loss_gt{small_gt}_ms']} ms")

    # derived attribution
    out["attribution"] = {
        "loss_ms": round(out["fwd_loss_ms"] - out["fwd_train_ms"], 2),
        "bwd_ms": round(out["fwd_bwd_ms"] - out["fwd_loss_ms"], 2),
        "opt_ms": round(out["step_no_ema_ms"] - out["fwd_bwd_ms"], 2),
        "ema_ms": round(out["step_full_ms"] - out["step_no_ema_ms"], 2),
        "remat_delta_ms": round(out["step_remat_ms"] - out["step_full_ms"], 2),
    }
    print("attribution:", out["attribution"])
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(f"-> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
