#!/usr/bin/env python3
"""One-off: bs=16 stage attribution (forward / +decode / +NMS), 3 compiles only."""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from yolo_master_tpu.nn.module import Context
from yolo_master_tpu.nn.tasks import DetectionModel
from yolo_master_tpu.ops.nms import non_max_suppression
from yolo_master_tpu.ops.pallas_stem import s2d4_blob
from yolo_master_tpu.utils.fuse import fuse_bn_params, pallas_stem_fuse

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
model = DetectionModel("yolo-master-n")
params = fuse_bn_params(model.init_params(0))
params = jax.tree_util.tree_map(lambda w: w.astype(jnp.bfloat16), params)
params = jax.device_put(pallas_stem_fuse(model, params, 640))


def chained(stage_fn):
    @jax.jit
    def run(p, x0, reps):
        def body(i, carry):
            x, acc = carry
            s = stage_fn(p, x)
            return x0 + (s * 1e-9).astype(x0.dtype), acc + s

        return jax.lax.fori_loop(0, reps, body, (x0, jnp.zeros((), jnp.float32)))[1]

    return run


def timed(stage_fn, n=5):
    x0 = s2d4_blob(jnp.full((BS, 3, 640, 640), 0.5, jnp.bfloat16))
    run = chained(stage_fn)

    def t(r):
        float(run(params, x0, r))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(run(params, x0, r))
            ts.append((time.perf_counter() - t0) * 1e3)
        ts.sort()
        return ts[len(ts) // 2]

    return (t(21) - t(1)) / 20


def fwd_only(p, x):
    preds = model.forward_train(p, x, Context(training=False))
    return preds["one2many"]["scores"].sum().astype(jnp.float32)


def fwd_decode(p, x):
    preds = model.forward_train(p, x, Context(training=False))
    return model.head.decode_topk(preds, k=1024).sum().astype(jnp.float32)


def e2e(p, x):
    preds = model.forward_train(p, x, Context(training=False))
    decoded = model.head.decode_topk(preds, k=1024)
    det = non_max_suppression(
        decoded, nc=model.nc, conf_thres=0.25, iou_thres=0.45, max_det=300,
        max_nms=1024, scores_are_logits=True,
    )
    return det["scores"].sum()


out = {"bs": BS}
out["forward_ms"] = round(timed(fwd_only), 4)
print("forward", out["forward_ms"], flush=True)
out["fwd_decode_ms"] = round(timed(fwd_decode), 4)
print("fwd+decode", out["fwd_decode_ms"], flush=True)
out["e2e_ms"] = round(timed(e2e), 4)
print("e2e", out["e2e_ms"], flush=True)
out["per_img_ms"] = round(out["e2e_ms"] / BS, 4)
print(json.dumps(out))
Path(f"runs/bench/sweep_bs{BS}_quick.json").parent.mkdir(parents=True, exist_ok=True)
Path(f"runs/bench/sweep_bs{BS}_quick.json").write_text(json.dumps(out))
