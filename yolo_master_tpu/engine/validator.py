"""Detection validator (reference: ultralytics/engine/validator.py:56-294 +
models/yolo/detect/val.py).

Eval loop: letterboxed batches -> jitted forward+decode -> fixed-shape NMS
(multi_label=True, conf=0.001, iou=0.7, the reference val defaults) ->
host-side greedy matching at 10 IoU thresholds -> ap_per_class.

Matching happens in ORIGINAL image space: predictions and targets are
unletterboxed per image (shapes read lazily from headers, no re-decode) and
predictions clipped to image bounds before matching — exactly the reference's
scale_boxes-then-match pipeline (detect/val.py).

Data-parallel: batches are sharded over the mesh 'data' axis; matching stats
accumulate on host (the single-program analog of the reference's
all_gather_object merge, detect/val.py:243-268).
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import DataLoader, YOLODataset
from ..nn.module import Context
from ..ops.nms import non_max_suppression
from ..utils import LOGGER
from ..utils.coco import COCO80_TO_COCO91
from ..utils.metrics import DetMetrics


class DetectionValidator:
    def __init__(
        self,
        yolo=None,
        model=None,
        params=None,
        data: Optional[str] = None,
        imgsz: int = 640,
        batch: int = 8,
        conf: float = 0.001,
        iou: float = 0.7,
        max_det: int = 300,
        max_nms: int = 4096,
        max_gt: int = 128,
        mesh=None,
        use_ema: bool = True,
        save_json: Optional[str] = None,
        backend=None,
    ):
        if yolo is not None:
            model = yolo.model
            params = params if params is not None else yolo.params
        self.backend = backend  # AutoBackend: validate exported artifacts
        if backend is not None:
            model = backend.model if backend.model is not None else model
            params = backend.params if backend.params is not None else params
        self.model = model
        self.params = params
        self.data = data
        self.imgsz = imgsz
        self.batch = batch
        self.conf, self.iou = conf, iou
        self.max_det, self.max_nms = max_det, max_nms
        self.max_gt = max_gt
        self.mesh = mesh
        self.save_json = save_json
        self._fn = None

    def _jit_fn(self):
        if self.backend is not None and self.backend.kind not in ("native", "npz"):
            be = self.backend
            if be.nms_embedded:
                LOGGER.warning("validating an NMS-embedded export: its baked conf/iou replace val thresholds")
            return lambda params, x: be.detect(
                np.asarray(x, np.float32), conf=self.conf, iou=self.iou,
                max_det=self.max_det, max_nms=self.max_nms, multi_label=True,
            )
        if self._fn is None:
            model, conf, iou = self.model, self.conf, self.iou
            max_det, max_nms = self.max_det, self.max_nms

            def run(params, x):
                decoded = model.forward_predict(params, x, Context(training=False))
                return non_max_suppression(
                    decoded, nc=model.nc, conf_thres=conf, iou_thres=iou,
                    max_det=max_det, max_nms=max_nms, multi_label=True,
                )

            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                self._fn = jax.jit(
                    run,
                    in_shardings=(NamedSharding(self.mesh, P()), NamedSharding(self.mesh, P("data"))),
                )
            else:
                self._fn = jax.jit(run)
        return self._fn

    def __call__(self, params=None, dataset: Optional[YOLODataset] = None) -> Dict[str, float]:
        params = params if params is not None else self.params
        if dataset is None:
            dataset = YOLODataset(self.data, split="val", imgsz=self.imgsz, max_gt=self.max_gt, augment=False)
        loader = DataLoader(dataset, self.batch, shuffle=False)
        metrics = DetMetrics(self.model.nc, dataset.names)
        fn = self._jit_fn()
        n_img = len(dataset)
        t0 = time.perf_counter()
        seen = 0
        jdict = [] if self.save_json else None
        # real COCO annotations use sparse category ids 1-90; map the
        # contiguous model index when the dataset is COCO (reference pred_to_json)
        names = getattr(dataset, "names", {}) or {}
        is_coco = len(names) == 80 and names.get(0) == "person" and names.get(79) == "toothbrush"
        self._class_map = COCO80_TO_COCO91 if is_coco else None
        for batch in loader.epoch(0):
            det = fn(params, jnp.asarray(batch["images"]))
            det = jax.tree_util.tree_map(np.asarray, det)
            bs = batch["images"].shape[0]
            for i in range(bs):
                if seen >= n_img:
                    break  # wrap-padded tail duplicates
                n = int(det["valid"][i].sum())
                gt_n = int(batch["mask"][i].sum())
                # match in ORIGINAL image space (reference scale_boxes before
                # update_metrics): unletterbox preds+GT, clip preds to bounds
                h0, w0 = dataset.shapes[seen]
                r, pad_x, pad_y = self._letterbox_params(h0, w0)
                pboxes = self._to_original(det["boxes"][i, :n], r, pad_x, pad_y, w0, h0, clip=True)
                gboxes = self._to_original(batch["boxes"][i, :gt_n], r, pad_x, pad_y, w0, h0, clip=False)
                metrics.update(
                    pboxes,
                    det["scores"][i, :n],
                    det["classes"][i, :n],
                    gboxes,
                    batch["classes"][i, :gt_n],
                )
                if jdict is not None and n:
                    self._append_json(jdict, dataset, seen, pboxes, det, i, n)
                seen += 1
        if jdict is not None:
            import json as _json
            from pathlib import Path as _Path

            _Path(self.save_json).write_text(_json.dumps(jdict))
            LOGGER.info(f"saved {len(jdict)} COCO-format predictions to {self.save_json}")
        out = metrics.compute()
        out["images"] = seen
        out["sec"] = time.perf_counter() - t0
        LOGGER.info(
            f"val: {seen} imgs  P {out['precision']:.3f}  R {out['recall']:.3f}  "
            f"mAP50 {out['mAP50']:.3f}  mAP50-95 {out['mAP50-95']:.3f}  ({out['sec']:.1f}s)"
        )
        return out

    def _letterbox_params(self, h0: int, w0: int):
        """Val preprocess transform, mirroring the reference composition:
        base.load_image rect-resize (long side -> imgsz, CEIL dims, up- and
        down-scaling) + LetterBox center pads. The returned gain is the
        H-axis resize ratio applied to BOTH axes — exactly the reference's
        scale_boxes with ratio_pad ((h1/h0, w1/w0), (left, top)), whose
        gain = ratio_pad[0][0] (utils/ops.py:148)."""
        import math

        r0 = self.imgsz / max(h0, w0)
        h1 = min(math.ceil(h0 * r0), self.imgsz) if r0 != 1 else h0
        w1 = min(math.ceil(w0 * r0), self.imgsz) if r0 != 1 else w0
        pad_x = round((self.imgsz - w1) / 2 - 0.1)
        pad_y = round((self.imgsz - h1) / 2 - 0.1)
        return h1 / h0, pad_x, pad_y

    @staticmethod
    def _to_original(boxes, r, pad_x, pad_y, w0, h0, clip: bool):
        boxes = np.asarray(boxes, np.float32).copy()
        boxes[:, [0, 2]] = (boxes[:, [0, 2]] - pad_x) / r
        boxes[:, [1, 3]] = (boxes[:, [1, 3]] - pad_y) / r
        if clip:
            boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, w0)
            boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, h0)
        return boxes

    def _append_json(self, jdict, dataset, img_index, boxes, det, i, n):
        """Append COCO-format rows from already-unletterboxed boxes
        (reference detect/val.py pred_to_json)."""
        path = dataset.img_files[img_index]
        from pathlib import Path as _Path

        stem = _Path(path).stem
        image_id = int(stem) if stem.isnumeric() else img_index
        cmap = getattr(self, "_class_map", None)
        for j in range(n):
            x1, y1, x2, y2 = boxes[j]
            c = int(det["classes"][i, j])
            jdict.append({
                "image_id": image_id,
                "category_id": cmap[c] if cmap else c,
                "bbox": [float(x1), float(y1), float(x2 - x1), float(y2 - y1)],
                "score": round(float(det["scores"][i, j]), 5),
            })
