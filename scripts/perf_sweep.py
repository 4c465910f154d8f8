#!/usr/bin/env python3
"""TPU perf sweep: stage-by-stage and knob-by-knob latency attribution.

Extends bench.py's chained-iteration methodology (relay-safe device timing)
into a sweep over the deployment knobs, so a perf session on a live chip can
localize the next win in minutes:

  * stage breakdown: forward-only -> +decode -> +NMS (bs=1 and bs=16)
  * decode top-k K sweep (candidate count feeding NMS)
  * Pallas greedy NMS vs XLA fast-NMS at each batch size
  * bf16 vs fp32 decode tail

Usage:  python scripts/perf_sweep.py [--model yolo-master-v0_1-l] [--bs 1 16]
        [--imgsz 640] [--layers] [--out sweep.json]
CPU smoke: add --cpu --tiny (validates the harness, numbers meaningless).

--layers: per-layer prefix attribution — time the forward truncated after
layer k for every k; layer cost = T(k) - T(k-1). One XLA compile per prefix
(compile-cache-warmed on repeat runs). This is how the v0.1-L MXU-utilization
hunt localizes its bottleneck (VERDICT r4 next #1).
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2] if (Path(__file__).resolve().parents[1].name == "scripts") else Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolo-master-n")
    ap.add_argument("--bs", type=int, nargs="+", default=[1, 16])
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--out", default="runs/bench/perf_sweep.json")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true", help="160px + fewer reps (harness smoke)")
    ap.add_argument("--layers", action="store_true", help="per-layer prefix attribution (skips the knob sweep)")
    ap.add_argument("--reps", type=int, default=None, help="chained-iteration count at the high anchor (default 41; layers mode 6)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from yolo_master_tpu.nn.module import Context
    from yolo_master_tpu.nn.tasks import DetectionModel
    from yolo_master_tpu.ops.nms import non_max_suppression
    from yolo_master_tpu.ops.pallas_stem import s2d4_blob
    from yolo_master_tpu.utils.fuse import fuse_bn_params, pallas_stem_fuse

    imgsz = 160 if args.tiny else args.imgsz
    # layers mode defaults to fewer chained reps: 25 prefixes x large-model
    # batches make 41-rep anchors cost ~30 min, and per-batch time >> relay
    # jitter there anyway
    hi = args.reps or (6 if (args.tiny or args.layers) else 41)
    reps = (1, hi)

    model = DetectionModel(args.model)
    params = fuse_bn_params(model.init_params(0))
    params = jax.tree_util.tree_map(lambda w: w.astype(jnp.bfloat16), params)
    use_pallas_stem = not args.cpu
    if use_pallas_stem:
        params = pallas_stem_fuse(model, params, imgsz)
    params = jax.device_put(params)

    def chained(stage_fn, bs):
        @jax.jit
        def run(p, x0, reps):
            def body(i, carry):
                x, acc = carry
                s = stage_fn(p, x)
                return x0 + (s * 1e-9).astype(x0.dtype), acc + s

            return jax.lax.fori_loop(0, reps, body, (x0, jnp.zeros((), jnp.float32)))[1]

        return run

    def timed(stage_fn, bs, n=5):
        if use_pallas_stem:
            x0 = s2d4_blob(jnp.full((bs, 3, imgsz, imgsz), 0.5, jnp.bfloat16))
        else:
            x0 = jnp.full((bs, imgsz, imgsz, 3), 0.5, jnp.bfloat16)
        run = chained(stage_fn, bs)

        def t(r):
            float(run(params, x0, r))
            ts = []
            for _ in range(n):
                t0 = time.perf_counter()
                float(run(params, x0, r))
                ts.append((time.perf_counter() - t0) * 1e3)
            ts.sort()
            return ts[len(ts) // 2]

        lo, hi = reps
        return (t(hi) - t(lo)) / (hi - lo)

    def prefix_fwd(k):
        """Forward truncated after layer k (graph walk with the save-list)."""

        def f(p, x):
            saved, y = {}, x
            lp = p["layers"]
            for spec in model.specs[: k + 1]:
                fr = spec.f
                if fr == -1:
                    inp = y
                elif isinstance(fr, int):
                    inp = saved[fr % spec.i]
                else:
                    inp = [y if j == -1 else saved[j % spec.i] for j in fr]
                y = spec.module(lp[str(spec.i)], inp, Context(training=False))
                if spec.i in model.save:
                    saved[spec.i] = y
            if isinstance(y, dict):  # Detect head output
                return y["one2many"]["scores"].sum().astype(jnp.float32)
            return y.sum().astype(jnp.float32)

        return f

    if args.layers:
        out = {"model": args.model, "imgsz": imgsz, "backend": jax.devices()[0].platform, "mode": "per-layer prefix"}
        for bs in args.bs:
            prev = 0.0
            rows = []
            for k, spec in enumerate(model.specs):
                tk = timed(prefix_fwd(k), bs)
                rows.append({"i": k, "module": spec.type_name, "prefix_ms": round(tk, 4), "layer_ms": round(tk - prev, 4)})
                print(f"bs={bs} layer {k:>2} {spec.type_name:<24} prefix {tk:8.4f} ms  Δ {tk - prev:8.4f} ms")
                prev = tk
            out[f"bs{bs}"] = rows
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(json.dumps(out, indent=1))
        print(f"-> {args.out}")
        return 0

    def fwd_only(p, x):
        preds = model.forward_train(p, x, Context(training=False))
        return preds["one2many"]["scores"].sum().astype(jnp.float32)

    def fwd_decode(k):
        def f(p, x):
            preds = model.forward_train(p, x, Context(training=False))
            return model.head.decode_topk(preds, k=k).sum().astype(jnp.float32)

        return f

    def e2e(k, fast=False):
        def f(p, x):
            preds = model.forward_train(p, x, Context(training=False))
            decoded = model.head.decode_topk(preds, k=k)
            det = non_max_suppression(
                decoded, nc=model.nc, conf_thres=0.25, iou_thres=0.45, max_det=300,
                max_nms=k, scores_are_logits=True, use_pallas=not fast and not args.cpu,
            )
            return det["scores"].sum()

        return f

    out = {"imgsz": imgsz, "backend": jax.devices()[0].platform}
    for bs in args.bs:
        row = {}
        row["forward_ms"] = round(timed(fwd_only, bs), 4)
        for k in ((512, 1024) if args.tiny else (512, 1024, 2048)):
            row[f"fwd_decode_k{k}_ms"] = round(timed(fwd_decode(k), bs), 4)
            row[f"e2e_k{k}_pallas_ms"] = round(timed(e2e(k), bs), 4)
        row["e2e_k1024_xla_ms"] = round(timed(e2e(1024, fast=True), bs), 4)
        out[f"bs{bs}"] = row
        print(f"bs={bs}: {row}")
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(f"-> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
