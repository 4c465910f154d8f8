"""Predictor: streaming inference over sources (reference: ultralytics/engine/predictor.py:73-539).

TPU-first layout: preprocess (letterbox, host) -> one jitted graph containing
model forward + decode + fixed-shape NMS (no host round-trip between forward
and NMS, per BASELINE north star) -> host-side box rescale into Results.

Batch-size bucketing keeps recompiles bounded: inputs are padded to the next
power-of-two batch (XLA static shapes).
"""

from __future__ import annotations

import glob
import time
from pathlib import Path
from typing import Any, Dict, Iterable, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..data.letterbox import letterbox
from ..nn.module import Context
from ..ops.nms import non_max_suppression
from ..utils import LOGGER
from .results import Results

IMG_FORMATS = {"bmp", "jpeg", "jpg", "png", "tif", "tiff", "webp"}


def load_image(path: str) -> np.ndarray:
    from ..utils.patches import imread

    im = imread(str(path))  # BGR HWC, unicode-safe (utils/patches.py)
    if im is None:
        raise FileNotFoundError(f"image not found or unreadable: {path}")
    return im


def expand_source(source) -> List[Any]:
    """Normalize a predict source into a list of (path, image or None)."""
    if isinstance(source, (list, tuple)):
        out = []
        for s in source:
            out.extend(expand_source(s))
        return out
    if isinstance(source, np.ndarray):
        return [("array", source)]
    p = Path(str(source))
    if p.is_dir():
        files = sorted(f for f in p.rglob("*") if f.suffix.lower().lstrip(".") in IMG_FORMATS)
        return [(str(f), None) for f in files]
    if any(ch in str(source) for ch in "*?["):
        return [(f, None) for f in sorted(glob.glob(str(source), recursive=True))]
    return [(str(p), None)]


class DetectionPredictor:
    """Batched detection inference (reference models/yolo/detect/predict.py)."""

    def __init__(
        self,
        model=None,
        params=None,
        names: Optional[Dict[int, str]] = None,
        imgsz: int = 640,
        conf: float = 0.25,
        iou: float = 0.45,
        max_det: int = 300,
        max_nms: int = 2048,
        agnostic_nms: bool = False,
        classes: Optional[Sequence[int]] = None,
        compute_dtype=jnp.float32,
        batch: int = 1,
        backend=None,
        second_nms_iou: Optional[float] = None,
        verbose: bool = False,
        mesh=None,
    ):
        # Multi-chip inference (SURVEY §7 step 8 / BASELINE config 5): with a
        # mesh, the jitted graph shards the batch over the 'data' axis and
        # replicates params — serving throughput scales with jax.device_count()
        # (the reference's analog is the Triton multi-instance path,
        # ultralytics/utils/triton.py:11). Batch sizes must divide the mesh.
        self.mesh = mesh
        self.backend = backend  # AutoBackend for exported artifacts
        if backend is not None:
            model = backend.model if backend.model is not None else model
            params = backend.params if backend.params is not None else params
            imgsz = backend.imgsz or imgsz
        self.model = model
        self.params = params
        nc = model.nc if model is not None else backend.nc
        self.names = names or {i: str(i) for i in range(nc)}
        self.imgsz = imgsz if isinstance(imgsz, (tuple, list)) else (imgsz, imgsz)
        self.conf, self.iou = conf, iou
        self.max_det, self.max_nms = max_det, max_nms
        self.agnostic = agnostic_nms
        self.compute_dtype = compute_dtype
        self.batch = batch
        # when set, a second NMS at this (looser) IoU runs in the same jit and
        # detections the tight pass dropped surface as Results.dets_del —
        # TrackTrack's recovered bucket (reference track_tracker.py:26,150)
        self.second_nms_iou = second_nms_iou
        self.verbose = verbose
        self.class_mask = None
        if classes is not None:
            m = np.zeros((nc,), np.float32)
            m[list(classes)] = 1.0
            self.class_mask = jnp.asarray(m)
        self._jitted = {}

    # -- device graph --------------------------------------------------------
    def _get_fn(self, bs: int):
        if self.backend is not None and self.backend.kind not in ("native", "npz"):
            # exported-artifact path: external runtime forward + jitted NMS
            be, conf, iou, max_det, max_nms = self.backend, self.conf, self.iou, self.max_det, self.max_nms
            return lambda params, x: be.detect(np.asarray(x, np.float32), conf=conf, iou=iou, max_det=max_det, max_nms=max_nms)
        if bs not in self._jitted:
            end2end = self.model.head.end2end

            supports_raw = hasattr(self.model.head, "decode") and "raw_scores" in self.model.head.decode.__code__.co_varnames
            # top-k-first fast path: DFL-decode only the top max_nms anchors
            # (selection on class-logit max commutes with sigmoid, and the NMS
            # single-label path only ever reads those candidates — exact).
            # Only for pure Detect decodes (Segment/Pose/OBB append extra
            # columns decode_topk doesn't carry) and unmasked classes (a
            # class_mask changes each anchor's ranking score).
            from ..nn.heads import Detect

            topk_exact = (
                type(self.model.head).decode is Detect.decode
                and not getattr(self.model.head, "xyxy", False)
                and self.class_mask is None
            )

            @jax.jit
            def run(params, x):
                ctx = Context(training=False)
                if x.dtype == jnp.uint8:
                    # raw uint8 transfer (4x smaller over PCIe/relay); the /255
                    # is folded into the stem weights (pallas_stem_fuse
                    # uint8_input=True), so a plain cast suffices here
                    x = x.astype(self.compute_dtype)
                preds = self.model.forward_train(params, x, ctx)
                if end2end:
                    decoded = self.model.head.decode(preds)
                    out = self.model.head.postprocess_end2end(decoded, self.max_det)
                    conf_ok = out[..., 4] > self.conf
                    return {
                        "boxes": out[..., :4],
                        "scores": out[..., 4] * conf_ok,
                        "classes": jnp.where(conf_ok, out[..., 5], -1.0),
                        "valid": conf_ok,
                    }
                # logits fast path: candidate selection pre-sigmoid (monotonic)
                if topk_exact:
                    decoded = self.model.head.decode_topk(preds, k=self.max_nms)
                else:
                    decoded = (self.model.head.decode(preds, raw_scores=True)
                               if supports_raw else self.model.head.decode(preds))

                def nms(iou):
                    return non_max_suppression(
                        decoded,
                        nc=self.model.nc,
                        conf_thres=self.conf,
                        iou_thres=iou,
                        max_det=self.max_det,
                        max_nms=self.max_nms,
                        agnostic=self.agnostic,
                        class_mask=self.class_mask,
                        scores_are_logits=supports_raw,
                    )

                det = nms(self.iou)
                if self.second_nms_iou is not None:
                    det["loose"] = nms(self.second_nms_iou)
                return det

            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                run = jax.jit(
                    run.__wrapped__,
                    in_shardings=(NamedSharding(self.mesh, P()), NamedSharding(self.mesh, P("data"))),
                )
            self._jitted[bs] = run
        return self._jitted[bs]

    # -- host pipeline ---------------------------------------------------------
    def preprocess(self, images: List[np.ndarray]):
        """Letterbox + BGR->RGB + /255, stacked NHWC float batch.

        Models fused with the Pallas stem (``YOLO.fuse(pallas_stem=True)``)
        set ``input_blob`` and consume the space-to-depth(4) host blob instead
        — the same host-side blob contract as the reference's TensorRT NCHW
        input step (reference data/augment.py letterbox + predictor blob)."""
        from ..data import native

        blob_path = self.model is not None and getattr(self.model, "input_blob", False)
        blob_u8 = blob_path and getattr(self.model, "input_blob_uint8", False)
        processed, meta = [], []
        for im in images:
            lb, ratio, pad = letterbox(im, self.imgsz)
            # fused native normalize/blob straight from letterboxed BGR uint8
            # (deploy/cpp ymt_preprocess: 7.1 -> 2.5 ms/frame measured); numpy
            # fallback inside data/native.py when the library isn't built.
            # uint8 blobs additionally shrink host->device transfer 4x (the
            # /255 is pre-folded into the stem weights).
            if blob_u8:
                processed.append(native.s2d4_blob_u8_from_bgr(lb))
            elif blob_path:
                processed.append(native.s2d4_blob_from_bgr(lb))
            else:
                processed.append(native.nhwc_normalize(lb))
            meta.append((im.shape[:2], ratio, pad))
        return np.stack(processed), meta

    def __call__(self, source, stream: bool = False, vid_stride: int = 1, stream_frames: Optional[int] = None):
        """Run inference over any source (images/dirs/globs/arrays/video files/
        RTSP/webcam/tensors — reference data/loaders.py:53-565 via
        data/loaders.py here). ``stream=True`` returns a generator that yields
        Results as frames arrive (the reference's stream_inference)."""
        gen = self._stream_results(source, vid_stride, stream_frames)
        return gen if stream else list(gen)

    def _stream_results(self, source, vid_stride: int, stream_frames: Optional[int]):
        from ..data.loaders import load_inference_source

        loader = load_inference_source(source, vid_stride=vid_stride, stream_frames=stream_frames)
        buf = []
        for item in loader:
            frames = item if isinstance(item, list) else [item]
            live = frames and frames[0].stream
            for f in frames:
                buf.append(f)
                if len(buf) == self.batch:
                    yield from self._run_batch(buf)
                    buf = []
            if live and buf:
                # flush live streams every tick: latency beats batching there
                yield from self._run_batch(buf)
                buf = []
        if buf:
            yield from self._run_batch(buf)

    def _run_batch(self, frames) -> List[Results]:
        t0 = time.perf_counter()
        images = [f.image for f in frames]
        x, meta = self.preprocess(images)
        t1 = time.perf_counter()
        bs = x.shape[0]
        # power-of-two bucketing (capped at self.batch): ragged tail
        # batches pad up to a bucket instead of triggering a fresh compile
        pad_to = min(self.batch, 1 << (bs - 1).bit_length())
        if pad_to != bs:
            x = np.concatenate([x, np.zeros((pad_to - bs, *x.shape[1:]), x.dtype)], 0)
        xj = jnp.asarray(x) if x.dtype == np.uint8 else jnp.asarray(x, self.compute_dtype)
        det = self._get_fn(pad_to)(self.params, xj)
        det = jax.tree_util.tree_map(np.asarray, det)
        t2 = time.perf_counter()
        results = []
        for i in range(bs):
            r = self._build_result(frames[i].path, images[i], meta[i], jax.tree_util.tree_map(lambda a: a[i], det))
            r.frame = frames[i].frame_idx
            results.append(r)
        t3 = time.perf_counter()
        for r in results:
            r.speed = {
                "preprocess": (t1 - t0) / bs * 1e3,
                "inference": (t2 - t1) / bs * 1e3,
                "postprocess": (t3 - t2) / bs * 1e3,
            }
            if self.verbose:
                h, w = r.orig_shape
                LOGGER.info(f"{r.path}: {w}x{h} {r.verbose()}{r.speed['inference']:.1f}ms")
        return results

    def _build_result(self, path, orig_img, meta, det) -> Results:
        orig_shape, ratio, pad = meta

        def unletterbox(boxes):
            boxes = boxes.copy()
            boxes[:, [0, 2]] = (boxes[:, [0, 2]] - pad[0]) / ratio[0]
            boxes[:, [1, 3]] = (boxes[:, [1, 3]] - pad[1]) / ratio[1]
            boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, orig_shape[1])
            boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, orig_shape[0])
            return boxes

        loose = det.pop("loose", None)
        n = int(det["valid"].sum())
        boxes = unletterbox(det["boxes"][:n])
        data = np.concatenate([boxes, det["scores"][:n, None], det["classes"][:n, None]], -1)
        r = Results(orig_img, path=path, names=self.names, boxes=data)
        if loose is not None:
            # recovered bucket: loose-NMS survivors the tight pass dropped
            # (max IoU vs every tight det < dedup 0.97 — track_tracker.py:171)
            m = int(loose["valid"].sum())
            lb = unletterbox(loose["boxes"][:m])
            if m and n:
                from ..utils.metrics import box_iou_np

                new = box_iou_np(lb, boxes).max(axis=1) < 0.97
            else:
                new = np.ones(m, bool)
            r.dets_del = (lb[new], loose["scores"][:m][new], loose["classes"][:m][new])
        return r
