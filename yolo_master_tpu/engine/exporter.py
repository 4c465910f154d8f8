"""Model export (reference: ultralytics/engine/exporter.py:140-1805).

The reference writes ~20 runtime formats from torch. The TPU-native deploy
path exports the jitted inference graph:

  | format       | artifact                         | route                   |
  |--------------|----------------------------------|-------------------------|
  | npz          | weights-only portable checkpoint | native                  |
  | saved_model  | TF SavedModel (serving/TF-Hub)   | jax2tf                  |
  | tflite       | .tflite flatbuffer (edge)        | jax2tf -> TFLiteConverter|
  | stablehlo    | portable StableHLO bytecode      | jax.export              |
  | onnx         | gated: needs tf2onnx/onnx (absent here)                    |

Exported graphs embed decode (+ optional NMS) like the reference's NMSModel
wrapper (exporter.py:1718), so consumers get [B, max_det, 6] directly.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.module import Context
from ..ops.nms import non_max_suppression
from ..utils import LOGGER
from ..utils.checkpoint import save_params_npz

EXPORT_FORMATS = {
    "npz": {"suffix": ".npz", "available": True},
    "saved_model": {"suffix": "_saved_model", "available": True},
    "tflite": {"suffix": ".tflite", "available": True},
    "stablehlo": {"suffix": ".stablehlo", "available": True},
    "onnx": {"suffix": ".onnx", "available": False, "reason": "onnx/tf2onnx not installed in this image"},
}


def _build_infer_fn(model, params, imgsz: int, nms: bool, max_det: int = 300, conf: float = 0.25, iou: float = 0.45):
    """Closure producing the deploy graph: forward + decode (+ NMS)."""

    def infer(x):
        decoded = model.forward_predict(params, x, Context(training=False))
        if not nms:
            return decoded
        if model.head.end2end:
            return model.head.postprocess_end2end(decoded, max_det)
        det = non_max_suppression(decoded, nc=model.nc, conf_thres=conf, iou_thres=iou, max_det=max_det, max_nms=2048)
        return jnp.concatenate(
            [det["boxes"], det["scores"][..., None], det["classes"][..., None]], -1
        )  # [B, max_det, 6]

    example = jnp.zeros((1, imgsz, imgsz, 3), jnp.float32)
    return infer, example


def export_model(
    model,
    params,
    fmt: str = "saved_model",
    imgsz: int = 640,
    output: Optional[str] = None,
    nms: bool = True,
    int8: bool = False,
    max_det: int = 300,
) -> str:
    """Export to the requested format; returns the artifact path."""
    fmt = fmt.lower()
    if fmt not in EXPORT_FORMATS:
        raise ValueError(f"unknown format '{fmt}' (choices: {list(EXPORT_FORMATS)})")
    info = EXPORT_FORMATS[fmt]
    if not info["available"]:
        raise RuntimeError(f"format '{fmt}' unavailable: {info.get('reason')}")
    name = getattr(model, "scale", None)
    base = output or f"{getattr(model, 'yaml_file', Path('model')).__str__().rsplit('/', 1)[-1].replace('.yaml', '')}"
    out_path = Path(output) if output else Path(f"{base}{info['suffix']}")

    # metadata sidecar consumed by AutoBackend (reference embeds metadata in
    # every artifact, exporter.py:536 "metadata" arg)
    meta = {
        "format": fmt,
        "imgsz": imgsz,
        "nc": model.nc,
        "nms": nms,
        "max_det": max_det,
        "layout": "NHWC",
        "task": getattr(model, "task", "detect"),
        "model": str(getattr(model, "yaml_file", "") or ""),
        "output": "[B,max_det,6]" if nms else "[B,A,4+nc]",
    }

    if fmt == "npz":
        save_params_npz(params, str(out_path), metadata={"imgsz": imgsz, "nc": model.nc})
        Path(str(out_path) + ".json").write_text(json.dumps(meta, indent=2))
        return str(out_path)

    # fold Conv+BN before graph capture (reference fuses at export,
    # exporter.py:536 deepcopy+fuse); numerically exact at eval
    from ..utils.fuse import fuse_bn_params

    params = fuse_bn_params(params)
    infer, example = _build_infer_fn(model, params, imgsz, nms, max_det=max_det)

    if fmt == "stablehlo":
        from jax import export as jexport

        exported = jexport.export(jax.jit(infer))(jax.ShapeDtypeStruct(example.shape, example.dtype))
        out_path.write_bytes(exported.serialize())
        Path(str(out_path) + ".json").write_text(json.dumps(meta, indent=2))
        return str(out_path)

    # TF routes
    import tensorflow as tf
    from jax.experimental import jax2tf

    tf_fn = tf.function(
        jax2tf.convert(infer, with_gradient=False),
        input_signature=[tf.TensorSpec(example.shape, tf.float32, name="images")],
        autograph=False,
    )

    if fmt == "saved_model":
        module = tf.Module()
        module.infer = tf_fn
        tf.saved_model.save(module, str(out_path), signatures={"serving_default": tf_fn})
        (out_path / "ymt_metadata.json").write_text(json.dumps(meta, indent=2))
        return str(out_path)

    if fmt == "tflite":
        converter = tf.lite.TFLiteConverter.from_concrete_functions([tf_fn.get_concrete_function()])
        converter.target_spec.supported_ops = [tf.lite.OpsSet.TFLITE_BUILTINS, tf.lite.OpsSet.SELECT_TF_OPS]
        if int8:
            converter.optimizations = [tf.lite.Optimize.DEFAULT]
        blob = converter.convert()
        out_path.write_bytes(blob)
        Path(str(out_path) + ".json").write_text(json.dumps(meta, indent=2))
        return str(out_path)

    raise AssertionError("unreachable")


def load_stablehlo(path: str):
    """Rehydrate a StableHLO artifact into a callable (round-trip check)."""
    from jax import export as jexport

    exported = jexport.deserialize(Path(path).read_bytes())
    return lambda x: exported.call(x)
