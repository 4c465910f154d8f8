"""gRPC model serving: Triton-analog inference server + client.

Reference: SURVEY.md §2.9 deliverable (b) — the reference deploys through
Triton Inference Server (gRPC ModelInfer protocol); this module provides the
TPU-native equivalent: a gRPC service fronting the jitted predict graph
(or any AutoBackend artifact), plus a thin client.

RPC surface (mirrors Triton's core trio):
    /ymt.Inference/ServerLive      -> liveness probe
    /ymt.Inference/ModelMetadata   -> names/shapes/task/imgsz JSON
    /ymt.Inference/ModelInfer      -> batched tensor in, detection tensors out

Wire format: gRPC with a self-describing binary tensor codec instead of
compiled protobuf stubs (grpc_python_plugin is not in this image; gRPC's
generic handlers accept arbitrary serializers). Layout per message:
    [4-byte little-endian header length][JSON header][raw tensor buffers]
    header = {"tensors": [{"name", "dtype", "shape"}...], "meta": {...}}
Buffers follow in header order, C-contiguous. Any gRPC client in any
language can speak it with ~20 lines of code.
"""

from __future__ import annotations

import json
import struct
from concurrent import futures
from typing import Any, Dict, Optional

import numpy as np

from .utils import LOGGER

SERVICE = "ymt.Inference"

# a 640x640x3 float32 tensor is 4.9 MB — past gRPC's 4 MB default cap; allow
# large-image and batched-tensor payloads on both directions (Triton defaults
# to unlimited for the same reason)
_MSG_SIZE_OPTIONS = [
    ("grpc.max_receive_message_length", 256 * 1024 * 1024),
    ("grpc.max_send_message_length", 256 * 1024 * 1024),
]


# ---------------------------------------------------------------------------
# Tensor codec
# ---------------------------------------------------------------------------

def encode(tensors: Dict[str, np.ndarray], meta: Optional[dict] = None) -> bytes:
    names = list(tensors)
    header = {
        "tensors": [
            {"name": n, "dtype": str(tensors[n].dtype), "shape": list(tensors[n].shape)}
            for n in names
        ],
        "meta": meta or {},
    }
    hb = json.dumps(header).encode()
    parts = [struct.pack("<I", len(hb)), hb]
    for n in names:
        parts.append(np.ascontiguousarray(tensors[n]).tobytes())
    return b"".join(parts)


def decode(blob: bytes):
    (hlen,) = struct.unpack_from("<I", blob, 0)
    header = json.loads(blob[4: 4 + hlen])
    off = 4 + hlen
    tensors = {}
    for spec in header["tensors"]:
        dt = np.dtype(spec["dtype"])
        n = int(np.prod(spec["shape"])) if spec["shape"] else 1
        size = n * dt.itemsize
        tensors[spec["name"]] = np.frombuffer(blob, dt, n, off).reshape(spec["shape"])
        off += size
    return tensors, header.get("meta", {})


# ---------------------------------------------------------------------------
# Server
# ---------------------------------------------------------------------------

class InferenceServer:
    """Serves a predictor's jitted graph over gRPC.

    ``predictor`` is any object with ``model``/``params``/``imgsz`` and a
    ``_get_fn(bs)`` device graph (DetectionPredictor and the task predictors
    qualify) — the server feeds preprocessed NHWC float batches straight to
    the graph, so serving latency is the compiled-graph latency."""

    def __init__(self, predictor, names: Optional[Dict[int, str]] = None, max_workers: int = 4,
                 max_batch: int = 0, batch_window_ms: float = 2.0,
                 max_message_mb: int = 256):
        self.predictor = predictor
        self.names = names or getattr(predictor, "names", {})
        self.max_workers = max_workers
        # Memory-exhaustion surface on non-loopback binds: an unauthenticated
        # peer can send payloads up to this cap. Keep the default only behind
        # 127.0.0.1; lower it when start(address=...) exposes the port.
        self.max_message_mb = max_message_mb
        self._server = None
        # dynamic micro-batching (Triton's dynamic_batching analog): requests
        # arriving within batch_window_ms coalesce into one device call up to
        # max_batch images. 0 disables (each request runs alone).
        self.max_batch = max_batch
        self.batch_window_ms = batch_window_ms
        self._queue = None
        if max_batch > 1:
            import queue as _q

            self._queue = _q.Queue()
        import threading

        # staging: host->device transfer runs OUTSIDE this lock, only the
        # graph dispatch inside — with several handler threads the next
        # request's transfer overlaps the running device call (the serving
        # analog of PrefetchLoader's producer-side device_put)
        self._dispatch_lock = threading.Lock()

    # -- handlers -----------------------------------------------------------
    def _live(self, request: bytes, ctx) -> bytes:
        return encode({}, {"live": True})

    def _metadata(self, request: bytes, ctx) -> bytes:
        p = self.predictor
        return encode({}, {
            "name": type(p.model).__name__ if p.model is not None else "backend",
            "imgsz": list(p.imgsz),
            "nc": p.model.nc if p.model is not None else p.backend.nc,
            "names": {str(k): v for k, v in self.names.items()},
            "inputs": [{"name": "images", "dtype": "float32",
                        "shape": [-1, p.imgsz[0], p.imgsz[1], 3]}],
            "outputs": [{"name": n} for n in ("boxes", "scores", "classes", "valid")],
        })

    def _run_device(self, x: np.ndarray):
        import jax
        import jax.numpy as jnp

        bs = x.shape[0]
        pad_to = max(1, 1 << (bs - 1).bit_length())
        mesh = getattr(self.predictor, "mesh", None)
        if mesh is not None:
            # mesh-sharded graph: the batch axis splits over 'data', so pad to
            # a multiple of the device count (serving scales with the mesh)
            n = mesh.devices.size
            pad_to = n * ((pad_to + n - 1) // n)
        if pad_to != bs:
            x = np.concatenate([x, np.zeros((pad_to - bs, *x.shape[1:]), x.dtype)], 0)
        # uint8 stays uint8 on the host->device transfer (4x less traffic than
        # fp32 — the bottleneck on relay-attached chips); the graph casts on
        # device, valid when /255 is folded into the stem (fold_uint8_input)
        dt = x.dtype if x.dtype == np.uint8 else self.predictor.compute_dtype
        xd = jax.device_put(jnp.asarray(x, dt))  # staged
        with self._dispatch_lock:
            out = self.predictor._get_fn(pad_to)(self.predictor.params, xd)
        # ONE batched device->host transfer (leaf-by-leaf np.asarray costs a
        # full relay round-trip per leaf)
        out = jax.device_get(out)
        return jax.tree_util.tree_map(lambda a: a[:bs], out)

    def _infer(self, request: bytes, ctx) -> bytes:
        tensors, meta = decode(request)
        x = tensors["images"]
        # canonicalize to the SCALE the model expects; folded stems
        # (fold_uint8_input / pallas_stem_fuse uint8_input=True) carry the
        # /255 in their weights and want 0..255-scale inputs
        folded = getattr(self.predictor.model, "input_blob_uint8", False)
        if x.dtype == np.uint8:
            if not folded:
                x = x.astype(np.float32) / 255.0
        else:
            x = x.astype(np.float32) * 255.0 if folded else x.astype(np.float32)
        bs = x.shape[0]
        if self._queue is None:
            out = self._run_device(x)
        else:
            out = self._infer_batched(x)
        return encode({k: v for k, v in out.items()}, {"batch": bs})

    def _infer_batched(self, x: np.ndarray):
        """Dynamic micro-batching: enqueue, and whichever thread drains the
        window runs ONE device call for everyone (Triton dynamic_batching)."""
        import queue as _q
        import threading
        import time as _time

        done = threading.Event()
        slot = {"x": x, "event": done, "out": None}
        self._queue.put(slot)
        _time.sleep(self.batch_window_ms / 1e3)  # let peers arrive
        batch = []
        try:
            while len(batch) < self.max_batch:
                batch.append(self._queue.get_nowait())
        except _q.Empty:
            pass
        if batch:  # this thread became the batch leader
            arrs = [s["x"] for s in batch]
            if len({a.dtype for a in arrs}) > 1:
                # mixed uint8/float clients in one window: _infer already
                # canonicalized SCALE per the model's folded-stem mode, so
                # dtype unification is a plain cast (no rescale)
                arrs = [a.astype(np.float32) for a in arrs]
            xs = np.concatenate(arrs, 0)
            out = self._run_device(xs)
            i = 0
            import jax

            for s in batch:
                n = s["x"].shape[0]
                s["out"] = jax.tree_util.tree_map(lambda a, i=i, n=n: a[i : i + n], out)
                i += n
                s["event"].set()
        done.wait(timeout=30.0)
        return slot["out"]

    # -- lifecycle ------------------------------------------------------------
    def start(self, port: int = 0, address: str = "127.0.0.1") -> int:
        """Start serving; returns the bound port (0 = ephemeral)."""
        import grpc

        rpcs = {
            "ServerLive": self._live,
            "ModelMetadata": self._metadata,
            "ModelInfer": self._infer,
        }
        handlers = {
            name: grpc.unary_unary_rpc_method_handler(
                fn, request_deserializer=None, response_serializer=None)
            for name, fn in rpcs.items()
        }
        self._server = grpc.server(
            futures.ThreadPoolExecutor(max_workers=self.max_workers),
            options=[
                ("grpc.max_receive_message_length", self.max_message_mb * 1024 * 1024),
                ("grpc.max_send_message_length", self.max_message_mb * 1024 * 1024),
            ],
        )
        self._server.add_generic_rpc_handlers(
            (grpc.method_handlers_generic_handler(SERVICE, handlers),))
        port = self._server.add_insecure_port(f"{address}:{port}")
        self._server.start()
        LOGGER.info(f"InferenceServer listening on {address}:{port}")
        return port

    def stop(self, grace: float = 0.5):
        if self._server is not None:
            self._server.stop(grace)
            self._server = None


# ---------------------------------------------------------------------------
# Client
# ---------------------------------------------------------------------------

class InferenceClient:
    """Thin Triton-style client over the same codec."""

    def __init__(self, target: str = "127.0.0.1:8001", timeout: float = 30.0):
        import grpc

        self.channel = grpc.insecure_channel(target, options=_MSG_SIZE_OPTIONS)
        self.timeout = timeout
        self._rpc = {
            name: self.channel.unary_unary(f"/{SERVICE}/{name}",
                                           request_serializer=None,
                                           response_deserializer=None)
            for name in ("ServerLive", "ModelMetadata", "ModelInfer")
        }

    def live(self) -> bool:
        _, meta = decode(self._rpc["ServerLive"](encode({}), timeout=self.timeout))
        return bool(meta.get("live"))

    def metadata(self) -> dict:
        _, meta = decode(self._rpc["ModelMetadata"](encode({}), timeout=self.timeout))
        return meta

    def infer(self, images: np.ndarray) -> Dict[str, np.ndarray]:
        """images: [B, H, W, 3], float32 in [0,1] OR raw uint8 (already
        letterboxed). uint8 ships as-is — 4x less wire+transfer traffic; the
        server normalizes (or the model's folded stem does, for free)."""
        images = np.asarray(images)
        if images.dtype != np.uint8:
            images = images.astype(np.float32)
        blob = self._rpc["ModelInfer"](encode({"images": images}), timeout=self.timeout)
        tensors, _ = decode(blob)
        return tensors

    def close(self):
        self.channel.close()
