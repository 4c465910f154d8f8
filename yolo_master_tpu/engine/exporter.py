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

def _has(mod: str) -> bool:
    import importlib.util

    return importlib.util.find_spec(mod) is not None


# Full reference format table (reference engine/exporter.py export_formats):
# natively-produced formats are available=True; converter-chain formats probe
# their toolchain and carry an actionable reason when absent. AutoBackend
# consumes the metadata sidecar written next to every artifact.
EXPORT_FORMATS = {
    "npz": {"suffix": ".npz", "available": True},
    "saved_model": {"suffix": "_saved_model", "available": True},
    "pb": {"suffix": ".pb", "available": True},  # frozen TF GraphDef
    "tflite": {"suffix": ".tflite", "available": True},  # + int8=True PTQ
    "stablehlo": {"suffix": ".stablehlo", "available": True},
    "onnx": {"suffix": ".onnx", "available": False, "reason": "onnx/tf2onnx not installed in this image"},
    "tfjs": {"suffix": "_web_model", "available": _has("tensorflowjs"),
             "reason": "pip install tensorflowjs, converts the saved_model export"},
    "edgetpu": {"suffix": "_edgetpu.tflite", "available": False,
                "reason": "needs the edgetpu_compiler binary over the int8 tflite export"},
    "openvino": {"suffix": "_openvino_model", "available": _has("openvino"),
                 "reason": "pip install openvino, converts the onnx/saved_model export"},
    "engine": {"suffix": ".engine", "available": False,
               "reason": "TensorRT is CUDA-only; on TPU the deploy path is saved_model/stablehlo (deploy/cpp)"},
    "coreml": {"suffix": ".mlpackage", "available": _has("coremltools"),
               "reason": "pip install coremltools, converts the saved_model export"},
    "torchscript": {"suffix": ".torchscript", "available": False,
                    "reason": "jax graphs have no torchscript lowering; use stablehlo or onnx"},
    "paddle": {"suffix": "_paddle_model", "available": _has("x2paddle"),
               "reason": "pip install x2paddle, converts the onnx export"},
    "ncnn": {"suffix": "_ncnn_model", "available": False, "reason": "needs the pnnx binary over the onnx export"},
    "mnn": {"suffix": ".mnn", "available": _has("MNN"), "reason": "pip install MNN, converts the onnx export"},
    "rknn": {"suffix": "_rknn_model", "available": _has("rknn_toolkit2"),
             "reason": "pip install rknn-toolkit2 on an RK-NPU host, converts the onnx export"},
    "imx": {"suffix": "_imx_model", "available": False, "reason": "needs Sony imx500-converter over the int8 onnx export"},
    "executorch": {"suffix": "_executorch_model", "available": _has("executorch"),
                   "reason": "pip install executorch, converts via torchscript (unavailable on the TPU path)"},
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

    # TF routes. Embed BOTH cpu and tpu lowerings: exporting from a
    # TPU-backend process otherwise pins the XlaCallModule to [TPU] and the
    # artifact dies on every CPU TF runtime (found driving export on the chip).
    import tensorflow as tf
    from jax.experimental import jax2tf

    tf_fn = tf.function(
        jax2tf.convert(infer, with_gradient=False, native_serialization_platforms=("cpu", "tpu")),
        input_signature=[tf.TensorSpec(example.shape, tf.float32, name="images")],
        autograph=False,
    )

    if fmt == "saved_model":
        module = tf.Module()
        module.infer = tf_fn
        tf.saved_model.save(module, str(out_path), signatures={"serving_default": tf_fn})
        (out_path / "ymt_metadata.json").write_text(json.dumps(meta, indent=2))
        return str(out_path)

    if fmt == "pb":
        # frozen GraphDef (reference export_pb): constants folded in, the
        # C++/TF-serving consumable single-file graph
        from tensorflow.python.framework.convert_to_constants import convert_variables_to_constants_v2

        frozen = convert_variables_to_constants_v2(tf_fn.get_concrete_function())
        tf.io.write_graph(frozen.graph.as_graph_def(), str(out_path.parent or "."), out_path.name, as_text=False)
        meta["inputs"] = [t.name for t in frozen.inputs]
        meta["outputs"] = [t.name for t in frozen.outputs]
        Path(str(out_path) + ".json").write_text(json.dumps(meta, indent=2))
        return str(out_path)

    if fmt == "tflite":
        converter = tf.lite.TFLiteConverter.from_concrete_functions([tf_fn.get_concrete_function()])
        converter.target_spec.supported_ops = [tf.lite.OpsSet.TFLITE_BUILTINS, tf.lite.OpsSet.SELECT_TF_OPS]
        if int8:
            converter.optimizations = [tf.lite.Optimize.DEFAULT]

            def _rep():  # post-training range calibration batches
                rng = np.random.default_rng(0)
                for _ in range(8):
                    yield [rng.uniform(0, 1, example.shape).astype(np.float32)]

            converter.representative_dataset = _rep
            meta["int8"] = True
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
