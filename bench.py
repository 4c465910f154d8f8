#!/usr/bin/env python
"""Benchmark: YOLO-Master-N end-to-end (forward + decode + NMS) p50 latency on
one TPU chip @640x640, the BASELINE.json north-star metric.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = reference latency (1.62 ms, README.md:46 TensorRT-class rig)
divided by ours — >1.0 means faster than the reference's published number.
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from yolo_master_tpu.nn.module import Context
    from yolo_master_tpu.nn.tasks import DetectionModel
    from yolo_master_tpu.ops.nms import non_max_suppression

    model = DetectionModel("yolo-master-n")
    # bf16 trunk (MXU-native), fp32 decode+NMS (Detect.decode upcasts)
    params = jax.device_put(
        jax.tree_util.tree_map(lambda w: w.astype(jnp.bfloat16), model.init_params(0))
    )

    @jax.jit
    def e2e(p, x):
        decoded = model.forward_predict(p, x, Context(training=False))
        return non_max_suppression(
            decoded, nc=model.nc, conf_thres=0.25, iou_thres=0.45, max_det=300, max_nms=2048
        )

    x = jnp.full((1, 640, 640, 3), 0.5, jnp.bfloat16)
    jax.block_until_ready(e2e(params, x))  # compile

    times = []
    for _ in range(50):
        t0 = time.perf_counter()
        jax.block_until_ready(e2e(params, x))
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    p50 = times[len(times) // 2]

    baseline_ms = 1.62  # reference YOLO-Master-N published latency
    print(
        json.dumps(
            {
                "metric": "yolo-master-n e2e p50 latency @640 bs=1 (fwd+decode+NMS, 1 chip)",
                "value": round(p50, 4),
                "unit": "ms",
                "vs_baseline": round(baseline_ms / p50, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
