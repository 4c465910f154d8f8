#!/usr/bin/env python
"""Serving QPS benchmark: in-process InferenceServer + concurrent clients.

Measures end-to-end request throughput (QPS) and latency percentiles of the
gRPC serving path under concurrency, with and without dynamic micro-batching
— the NOTES_ROUND3 queue item ("measure QPS under the gRPC client"). The
Python InferenceClient drives by default; pass --cpp-client <bin> to route
requests through the dependency-free C++ client instead
(deploy/cpp/src/grpc_client_main.cpp).

Usage: python scripts/bench_serving.py [--model yolo-master-n] [--imgsz 640]
           [--clients 8] [--requests 40] [--max-batch 8]
"""

from __future__ import annotations

import argparse
import statistics
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolo-master-n")
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--requests", type=int, default=40, help="per client")
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--window-ms", type=float, default=2.0)
    ap.add_argument("--cpp-client", default=None, help="path to compiled ymt_grpc_client")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from yolo_master_tpu.engine.predictor import DetectionPredictor
    from yolo_master_tpu.models.yolo import YOLO
    from yolo_master_tpu.serving import InferenceClient, InferenceServer

    y = YOLO(args.model)
    pred = DetectionPredictor(y.model, y.params, imgsz=args.imgsz)

    for max_batch in (0, args.max_batch):
        srv = InferenceServer(pred, max_workers=max(8, args.clients),
                              max_batch=max_batch, batch_window_ms=args.window_ms)
        port = srv.start(port=0)
        x = np.random.default_rng(0).uniform(0, 1, (1, args.imgsz, args.imgsz, 3)).astype(np.float32)

        # warm the compiled graphs: bs=1 plus every power-of-two padded
        # micro-batch size the batcher can hit — up to the NEXT power of two
        # above max_batch, since the server pads coalesced batches upward
        # (a 5-image batch under max_batch=6 pads to 8). First compile
        # through the relay can take minutes — use a generous timeout.
        warm = InferenceClient(f"127.0.0.1:{port}", timeout=600.0)
        sizes = {1}
        b = 2
        pad_ceiling = 1 << (max_batch - 1).bit_length() if max_batch > 1 else max_batch
        while max_batch and b <= pad_ceiling:
            sizes.add(b)
            b *= 2
        for s in sorted(sizes):
            warm.infer(np.repeat(x, s, axis=0))
        warm.close()

        lat: list[float] = []
        lock = threading.Lock()

        def worker():
            c = InferenceClient(f"127.0.0.1:{port}")
            for _ in range(args.requests):
                t0 = time.perf_counter()
                c.infer(x)
                dt = (time.perf_counter() - t0) * 1000
                with lock:
                    lat.append(dt)
            c.close()

        threads = [threading.Thread(target=worker) for _ in range(args.clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        srv.stop()

        lat.sort()
        n = len(lat)
        print(
            f"max_batch={max_batch:2d}  qps={n / wall:7.1f}  "
            f"p50={lat[n // 2]:6.1f}ms  p95={lat[int(n * 0.95)]:6.1f}ms  "
            f"mean={statistics.fmean(lat):6.1f}ms  ({args.clients} clients x {args.requests} reqs)"
        )

    if args.cpp_client:
        # client CLI: <target> <image> [imgsz] [conf] — one request per run;
        # loop it from N threads for a process-per-request QPS floor
        import subprocess
        import tempfile

        import cv2

        img = (np.random.default_rng(1).uniform(0, 255, (args.imgsz, args.imgsz, 3))).astype(np.uint8)
        with tempfile.NamedTemporaryFile(suffix=".png", delete=False) as f:
            cv2.imwrite(f.name, img)
            img_path = f.name
        srv = InferenceServer(pred, max_workers=8, max_batch=args.max_batch,
                              batch_window_ms=args.window_ms)
        port = srv.start(port=0)
        n = args.clients * args.requests

        def cpp_worker():
            for _ in range(args.requests):
                subprocess.run([args.cpp_client, f"127.0.0.1:{port}", img_path, str(args.imgsz)],
                               capture_output=True)

        threads = [threading.Thread(target=cpp_worker) for _ in range(args.clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        srv.stop()
        print(f"cpp-client   qps={n / wall:7.1f}  (process-per-request, {args.clients} workers)")


if __name__ == "__main__":
    main()
