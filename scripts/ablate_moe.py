#!/usr/bin/env python
"""MoE ablation sweep (reference scripts/ ablation suites): dense-vs-sparse
eval parity and latency across mixture configs on one chip.

    python scripts/ablate_moe.py --configs yolo-master-n yolo-master-v0_10-n \
        --imgsz 640 [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def bench_model(name: str, imgsz: int, reps: int = 21):
    import jax
    import jax.numpy as jnp

    from yolo_master_tpu.nn.module import Context
    from yolo_master_tpu.nn.tasks import DetectionModel

    model = DetectionModel(name)
    params = jax.device_put(model.init_params(0))
    x = jnp.full((1, imgsz, imgsz, 3), 0.5, jnp.float32)

    def chained(sparse, r):
        @jax.jit
        def run(p, x0):
            def body(i, carry):
                xx, acc = carry
                ctx = Context(training=False, sparse_inference=sparse)
                out = model.forward_predict(p, xx, ctx)
                s = jnp.sum(out).astype(jnp.float32)
                return x0 + (s * 1e-12).astype(x0.dtype), acc + s
            return jax.lax.fori_loop(0, r, body, (x0, jnp.zeros((), jnp.float32)))[1]
        return run

    def t(run, n=5):
        float(run(params, x))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(run(params, x))
            ts.append((time.perf_counter() - t0) * 1e3)
        ts.sort()
        return ts[len(ts) // 2]

    row = {"model": name}
    for sparse in (False, True):
        per = (t(chained(sparse, reps)) - t(chained(sparse, 1))) / (reps - 1)
        row["sparse_ms" if sparse else "dense_ms"] = round(per, 4)
    # output parity dense vs sparse
    import numpy as np

    d = model.forward_predict(params, x, Context(training=False, sparse_inference=False))
    s = model.forward_predict(params, x, Context(training=False, sparse_inference=True))
    row["parity_maxerr"] = float(np.abs(np.asarray(d) - np.asarray(s)).max())
    row["speedup"] = round(row["dense_ms"] / max(row["sparse_ms"], 1e-9), 3)
    return row


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="+", default=["yolo-master-n"])
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    rows = []
    for name in args.configs:
        row = bench_model(name, args.imgsz)
        print(json.dumps(row))
        rows.append(row)
    if args.json:
        Path(args.json).write_text(json.dumps(rows, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
