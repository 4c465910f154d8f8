"""Coarse e2e latency budget on the real chip: forward / +decode / +NMS at
bs=1 and bs=16, deploy-fused (BN fold + bf16 + Pallas stem), chained-iteration
timing with a dynamic trip count (one compile per variant — the axon relay
acks dispatches asynchronously, so per-call host timing under-reports;
see bench.py for the methodology)."""
import time

import jax
import jax.numpy as jnp

from yolo_master_tpu.nn.module import Context
from yolo_master_tpu.nn.tasks import DetectionModel
from yolo_master_tpu.ops.nms import non_max_suppression
from yolo_master_tpu.ops.pallas_stem import s2d4_blob
from yolo_master_tpu.utils.fuse import fuse_bn_params, pallas_stem_fuse

model = DetectionModel("yolo-master-n")
params = fuse_bn_params(model.init_params(0))
params = jax.tree_util.tree_map(lambda w: w.astype(jnp.bfloat16), params)
params = jax.device_put(pallas_stem_fuse(model, params, 640))


def fwd(p, x):
    preds = model.forward_train(p, x, Context(training=False))
    return sum(jnp.sum(jnp.asarray(v, jnp.float32)) * 1e-9
               for v in jax.tree_util.tree_leaves(preds) if hasattr(v, "shape"))


def fwd_dec(p, x):
    preds = model.forward_train(p, x, Context(training=False))
    return jnp.sum(model.head.decode(preds, raw_scores=True).astype(jnp.float32)) * 1e-9


def e2e(p, x):
    preds = model.forward_train(p, x, Context(training=False))
    decoded = model.head.decode(preds, raw_scores=True)
    det = non_max_suppression(decoded, nc=model.nc, conf_thres=0.25,
                              iou_thres=0.45, max_det=300, max_nms=1024,
                              scores_are_logits=True)
    return det["scores"].sum()


def make_run(fn, bs):
    x0 = s2d4_blob(jnp.full((bs, 3, 640, 640), 0.5, jnp.bfloat16))

    @jax.jit
    def run(p, x, reps):  # dynamic trip count: ONE compile per (fn, bs)
        def body(carry):
            i, xx, acc = carry
            s = fn(p, xx)
            return i + 1, x0 + (s * 1e-9).astype(x0.dtype), acc + s
        return jax.lax.while_loop(lambda c: c[0] < reps, body, (jnp.zeros((), jnp.int32), x, jnp.zeros((), jnp.float32)))[2]

    return run, x0


def timed(run, x0, reps, n=5):
    r = jnp.asarray(reps, jnp.int32)
    float(run(params, x0, r))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); float(run(params, x0, r)); ts.append((time.perf_counter() - t0) * 1e3)
    ts.sort()
    return ts[len(ts) // 2]


for bs, reps in ((1, 40), (16, 20)):
    for name, fn in (("fwd", fwd), ("fwd+dec", fwd_dec), ("e2e", e2e)):
        run, x0 = make_run(fn, bs)
        t1 = timed(run, x0, 1)
        tk = timed(run, x0, reps + 1)
        per = (tk - t1) / reps
        print(f"bs{bs:2d} {name:8s}: {per:.4f} ms  ({per / bs:.4f}/img)", flush=True)
