"""AutoBackend: one inference interface over every artifact the exporter
writes (reference: ultralytics/nn/autobackend.py:89 + nn/backends/base.py:41).

Dispatch by artifact:
  * native      — (model, params) pair, jitted forward+decode on TPU
  * npz         — weights-only checkpoint rebuilt into the named model
  * saved_model — TF SavedModel via the TF runtime
  * pb          — frozen TF GraphDef pruned to a concrete function
  * tflite      — TFLite flatbuffer via tf.lite.Interpreter
  * stablehlo   — portable bytecode re-hydrated with jax.export

Every backend exposes ``__call__(x: [B,H,W,3] float32 NHWC in [0,1]) ->
np.ndarray`` returning either decoded predictions ``[B, A, 4+nc]`` (when the
graph was exported without NMS) or final detections ``[B, max_det, 6]``
(NMS embedded). ``nms_embedded`` tells the consumer which; predict/val run
their own NMS only in the first case — this is how the reference validates
the mAP of every export format.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import numpy as np


class AutoBackend:
    def __init__(self, weights=None, model=None, params=None, nc: Optional[int] = None):
        self.kind = None
        self.meta = {}
        self._fn = None
        self.model = model
        self.params = params

        if weights is None:
            assert model is not None and params is not None, "native backend needs model+params"
            self.kind = "native"
            self.nms_embedded = False
            self.nc = model.nc
            self.imgsz = None
            return

        if str(weights).startswith(("grpc://", "triton://")):
            # remote inference server (serving.py InferenceServer — the
            # reference's TritonRemoteModel scheme, utils/triton.py:11)
            from ..serving import InferenceClient

            self.kind = "grpc"
            self._client = InferenceClient(str(weights).split("://", 1)[1])
            md = self._client.metadata()
            self.meta = md
            self.nc = int(md.get("nc", nc or 80))
            self.imgsz = md.get("imgsz")
            self.nms_embedded = True  # the server graph runs its own NMS
            return

        path = Path(str(weights))
        meta = self._read_meta(path)
        self.meta = meta
        self.nc = int(meta.get("nc", nc or 80))
        self.imgsz = meta.get("imgsz")
        self.nms_embedded = bool(meta.get("nms", False))

        if path.is_dir():  # SavedModel
            self.kind = "saved_model"
            import tensorflow as tf

            self._tf_model = tf.saved_model.load(str(path))
            self._fn = self._tf_model.signatures["serving_default"]
        elif path.suffix == ".tflite":
            self.kind = "tflite"
            import tensorflow as tf

            self._interp = tf.lite.Interpreter(model_path=str(path))
            self._interp.allocate_tensors()
            self._in = self._interp.get_input_details()[0]
            self._outs = self._interp.get_output_details()
        elif path.suffix == ".pb":
            self.kind = "pb"
            import tensorflow as tf

            gd = tf.compat.v1.GraphDef()
            gd.ParseFromString(path.read_bytes())
            in_names = [n.split(":")[0] for n in meta.get("inputs", ["images"])]
            out_names = meta.get("outputs") or [n.name + ":0" for n in gd.node if n.op not in ("Const", "Placeholder")][-1:]

            def _import():
                tf.compat.v1.import_graph_def(gd, name="")

            wrapped = tf.compat.v1.wrap_function(_import, [])
            g = wrapped.graph
            self._fn = wrapped.prune(
                [g.get_tensor_by_name(f"{in_names[0]}:0")],
                [g.get_tensor_by_name(n if ":" in n else n + ":0") for n in out_names],
            )
        elif path.suffix == ".stablehlo":
            self.kind = "stablehlo"
            from jax import export as jexport

            self._exported = jexport.deserialize(path.read_bytes())
        elif path.suffix == ".npz":
            self.kind = "npz"
            from ..utils.checkpoint import load_params_npz

            if model is None:
                name = meta.get("model", "")
                if not name:
                    raise ValueError("npz backend needs the model (no model name in metadata)")
                from .tasks import DetectionModel

                model = DetectionModel(name.replace(".yaml", ""), nc=self.nc)
            self.model = model
            self.params = load_params_npz(str(path))
            self.nms_embedded = False
        else:
            raise ValueError(f"unrecognized artifact: {weights}")

    @staticmethod
    def _read_meta(path: Path) -> dict:
        for cand in (Path(str(path) + ".json"), path / "ymt_metadata.json" if path.is_dir() else None):
            if cand and cand.exists():
                return json.loads(cand.read_text())
        return {}

    # -- unified forward -------------------------------------------------------
    def __call__(self, x: np.ndarray) -> np.ndarray:
        """x: [B, H, W, 3] float32 NHWC in [0,1] -> decoded preds or detections."""
        out = self._forward(x)
        if self.meta.get("decode") == "host":
            out = self._host_decode(out)
        return out

    def _host_decode(self, raw: np.ndarray) -> np.ndarray:
        """Float DFL/decode/sigmoid tail for artifacts exported with
        host_decode=True (full-int8 PTQ: the quantized body returns raw head
        logits [B, A, 4*reg_max+nc]; int8 activation grids on this tail cost
        ~0.21 mAP50-95, measured in tests/test_quant_accuracy.py)."""
        import jax
        import jax.numpy as jnp

        from ..ops.anchors import dfl_decode, dist2bbox, make_anchors

        m = self.meta
        reg_max = int(m.get("reg_max", 16))
        strides = [int(s) for s in m["strides"]]
        hw = [(int(h), int(w)) for h, w in m["hw_shapes"]]
        raw = jnp.asarray(raw, jnp.float32)
        anchors, strd = make_anchors(hw, strides)
        dist = dfl_decode(raw[..., : 4 * reg_max], reg_max)
        xywh = not bool(m.get("end2end")) and not bool(m.get("xyxy"))
        dbox = dist2bbox(dist, anchors[None], xywh=xywh) * strd[None]
        return np.asarray(jnp.concatenate([dbox, jax.nn.sigmoid(raw[..., 4 * reg_max :])], -1))

    def _forward(self, x: np.ndarray) -> np.ndarray:
        if self.kind in ("native", "npz"):
            import jax

            if self._fn is None:
                import jax.numpy as jnp

                from .module import Context

                model = self.model

                def run(p, xx):
                    return model.forward_predict(p, xx, Context(training=False))

                self._fn = jax.jit(run)
            return np.asarray(self._fn(self.params, x))
        if self.kind == "saved_model":
            import tensorflow as tf

            out = self._fn(images=tf.constant(np.asarray(x, np.float32)))
            return next(iter(out.values())).numpy()
        if self.kind == "pb":
            import tensorflow as tf

            out = self._fn(tf.constant(np.asarray(x, np.float32)))
            return (out[0] if isinstance(out, (list, tuple)) else out).numpy()
        if self.kind == "tflite":
            out = []
            xin = np.asarray(x, self._in["dtype"])
            for i in range(xin.shape[0]):  # tflite graphs are bs-1 static
                self._interp.set_tensor(self._in["index"], xin[i : i + 1])
                self._interp.invoke()
                out.append(self._interp.get_tensor(self._outs[0]["index"]))
            return np.concatenate(out, 0)
        if self.kind == "stablehlo":
            import jax

            outs = []
            for i in range(np.asarray(x).shape[0]):  # exported with bs-1 example
                outs.append(np.asarray(self._exported.call(np.asarray(x[i : i + 1], np.float32))))
            return np.concatenate(outs, 0)
        raise AssertionError(self.kind)

    def detect(self, x: np.ndarray, conf: float = 0.25, iou: float = 0.45, max_det: int = 300, max_nms: int = 2048, multi_label: bool = False) -> dict:
        """Full detection: backend forward + (host-side jitted) NMS when the
        graph didn't embed it. Returns the NMS dict contract
        (boxes/scores/classes/valid)."""
        if self.kind == "grpc":
            # the remote graph applies its own thresholds (server-side cfg);
            # re-gate conf locally so the caller's intent still applies
            det = self._client.infer(np.asarray(x, np.float32))
            valid = det["valid"].astype(bool) & (det["scores"] > conf)
            return {"boxes": det["boxes"], "scores": det["scores"] * valid,
                    "classes": np.where(valid, det["classes"], -1.0), "valid": valid}
        out = self(x)
        if self.nms_embedded:
            boxes, scores, classes = out[..., :4], out[..., 4], out[..., 5]
            valid = scores > conf
            return {
                "boxes": boxes,
                "scores": scores * valid,
                "classes": np.where(valid, classes, -1.0),
                "valid": valid,
            }
        import jax
        import jax.numpy as jnp

        from ..ops.nms import non_max_suppression

        det = non_max_suppression(
            jnp.asarray(out), nc=self.nc, conf_thres=conf, iou_thres=iou, max_det=max_det, max_nms=max_nms,
            multi_label=multi_label,
        )
        return jax.tree_util.tree_map(np.asarray, det)
