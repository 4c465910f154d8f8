"""Deploy-time parameter surgery: fold BatchNorm into the preceding conv
(reference: ultralytics/utils/torch_utils.py:315 fuse_conv_and_bn, applied by
BaseModel.fuse before export/benchmark).

Pure pytree surgery — no module changes. Conv.__call__ detects the fused form
by the presence of params["conv"]["b"] and the absence of the "bn" subtree.
"""

from __future__ import annotations

import jax.numpy as jnp


def _is_bn(node) -> bool:
    return isinstance(node, dict) and {"scale", "bias", "mean", "var"} <= set(node)


def fuse_bn_params(params, eps: float = 1e-3):
    """Return a new params tree with Conv+BN pairs folded.

    Folds two layouts:
      * Conv:                  {"conv": {"w"}, "bn": {...}}
      * DepthwiseSeparableConv {"depthwise", "pointwise", "bn"} (fold into pw)
    Standalone BatchNorms (e.g. ES-MoE output norm) are left untouched.
    """

    def fold(w, b, bn):
        inv = bn["scale"] / jnp.sqrt(bn["var"] + eps)
        w2 = w * inv[None, None, None, :]
        b2 = (b if b is not None else 0.0) * inv + bn["bias"] - bn["mean"] * inv
        return w2, b2

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {k: walk(v) for k, v in node.items()}
        bn = out.get("bn")
        if _is_bn(bn):
            if "conv" in out and isinstance(out["conv"], dict) and "w" in out["conv"]:
                w2, b2 = fold(out["conv"]["w"], out["conv"].get("b"), bn)
                out["conv"] = {"w": w2, "b": b2}
                del out["bn"]
            elif "pointwise" in out and isinstance(out["pointwise"], dict) and "w" in out["pointwise"]:
                w2, b2 = fold(out["pointwise"]["w"], out["pointwise"].get("b"), bn)
                out["pointwise"] = {"w": w2, "b": b2}
                del out["bn"]
        return out

    return walk(params)


def s2d_stem(model, params, max_layers: int = 2):
    """Rewrite the leading k3/s2 stem Convs into SpaceToDepthConv form
    (exact; see nn/layers.py SpaceToDepthConv). Mutates the model's layer
    specs in place and returns a NEW params tree with remapped stem weights.

    Apply AFTER fuse_bn_params (works either way — both conv/b and bn
    subtrees are carried through)."""
    from ..nn.layers import Conv, SpaceToDepthConv
    from ..nn.module import dict_copy

    params = dict_copy(params)
    for spec in model.specs[:max_layers]:
        m = spec.module
        if not (isinstance(m, Conv) and type(m) is Conv and m.kh == m.kw == 3
                and m.s == 2 and m.g == 1 and m.d == 1 and m.p == (1, 1)):
            break
        s2d = SpaceToDepthConv(m)
        s2d.finalize(m.path)
        spec.module = s2d
        leaf = params["layers"][str(spec.i)]
        leaf["conv"] = dict(leaf["conv"])
        leaf["conv"]["w"] = SpaceToDepthConv.remap_weight(leaf["conv"]["w"])
    return params


def pallas_stem_fuse(model, params, imgsz: int, width: int = 0, uint8_input: bool = False):
    """Replace the two leading k3/s2 stem Convs with the fused Pallas stem
    kernel (nn/layers.py PallasStem over ops/pallas_stem.py — 3.3x measured).

    Requires BN-folded params (fuse_bn_params first: the kernel consumes
    conv biases). Mutates model.specs in place, sets ``model.input_blob``,
    and returns a NEW params tree whose stem leaves are {w0,b0,w1,b1}.
    Callers must then feed s2d4 blobs (ops.pallas_stem.s2d4_blob[_np]).

    ``uint8_input=True`` folds the /255 normalization into the conv0 weights
    so callers can ship RAW uint8 blobs (data/native.py s2d4_blob_u8_from_bgr)
    — 4x smaller host->device transfer; the device casts to compute dtype and
    the scaled weights normalize for free."""
    from ..nn.layers import Conv, PallasStem, Passthrough
    from ..nn.module import dict_copy

    s0, s1 = model.specs[0], model.specs[1]
    for m in (s0.module, s1.module):
        if not (isinstance(m, Conv) and type(m) is Conv and m.kh == m.kw == 3
                and m.s == 2 and m.g == 1 and m.d == 1 and m.p == (1, 1)):
            raise ValueError("pallas_stem_fuse needs two leading k3/s2 dense Convs")
    params = dict_copy(params)
    l0 = params["layers"]["0"]["conv"]
    l1 = params["layers"]["1"]["conv"]
    if "b" not in l0 or "b" not in l1:
        raise ValueError("run fuse_bn_params first (stem kernel consumes conv biases)")
    stem = PallasStem(s0.module, s1.module, imgsz, width)
    stem.finalize(s0.module.path)
    s0.module = stem
    s1.module = Passthrough()
    w0 = l0["w"] / 255.0 if uint8_input else l0["w"]
    params["layers"]["0"] = {"w0": w0, "b0": l0["b"], "w1": l1["w"], "b1": l1["b"]}
    model.input_blob_uint8 = uint8_input
    params["layers"]["1"] = {}
    model.input_blob = True
    return params


def fold_uint8_input(model, params):
    """Fold the /255 input normalization into the layer-0 conv weights so the
    model accepts RAW uint8 NHWC images (cast-only on device, no scaling op).

    The non-Pallas analog of ``pallas_stem_fuse(uint8_input=True)`` — use for
    paths that feed plain NHWC (serving, AutoBackend) rather than s2d4 blobs.
    uint8 halves-again the host->device transfer vs bf16 (4x vs fp32), which
    is the serving bottleneck on relay-attached chips (~74 MB/s measured).
    Returns a NEW params tree; sets ``model.input_blob_uint8``."""
    from ..nn.module import dict_copy

    params = dict_copy(params)
    l0 = params["layers"]["0"]["conv"]
    l0["w"] = l0["w"] / 255.0
    model.input_blob_uint8 = True
    return params


def block_c3k2(model, params, layers=None, min_pad_ratio: float = 2.0):
    """Rewrite small-channel C3k2 blocks to space-to-depth(2) BLOCKED
    execution (nn/blocked.py — the HBM-padding fix; exact).

    Requires BN-folded params. ``layers``: spec indices to convert (default:
    every plain-Bottleneck C3k2 whose input channels pad the 128-lane tile by
    >= min_pad_ratio). Mutates model.specs; returns new params."""
    from ..nn.blocked import BlockedC3k2
    from ..nn.layers import Bottleneck, C3k2
    from ..nn.module import dict_copy

    params = dict_copy(params)
    chosen = []
    for spec in model.specs:
        m = spec.module
        if type(m) is not C3k2 or not all(isinstance(b, Bottleneck) for b in m.m):
            continue
        cin = m.cv1.c1
        if layers is not None:
            if spec.i in layers:
                chosen.append(spec)
        elif 128 / max(cin % 128 or 128, 1) >= min_pad_ratio and cin < 128:
            chosen.append(spec)
    for spec in chosen:
        folded = params["layers"][str(spec.i)]
        if "b" not in folded["cv1"]["conv"]:
            raise ValueError("run fuse_bn_params before block_c3k2")
        blocked = BlockedC3k2(spec.module)
        blocked.finalize(spec.module.path)
        params["layers"][str(spec.i)] = BlockedC3k2.remap_params(folded)
        spec.module = blocked
    return params


def pallas_esmoe_fuse(model, params, layers=None):
    """Swap dense-eval ES_MOE blocks for the whole-plane fused Pallas kernel
    (nn/moe/es_moe.py PallasESMOE over ops/pallas_esmoe.py).

    Works on raw or BN-folded params (expert/norm BNs are folded into the
    kernel banks here either way). Mutates model.specs in place; returns a
    NEW params tree where each swapped layer holds {"routing", "banks"}.
    ``layers`` restricts the surgery to the given spec indices."""
    from ..nn.moe.es_moe import ES_MOE, PallasESMOE
    from ..nn.module import dict_copy
    from ..ops.pallas_esmoe import pack_esmoe_params

    params = dict_copy(params)
    for spec in model.specs:
        m = spec.module
        if type(m) is not ES_MOE or not m.pallas_fusable():
            continue
        if layers is not None and spec.i not in layers:
            continue
        p = params["layers"][str(spec.i)]
        dw, pw, pb, gamma, beta, ks = pack_esmoe_params(m, p)
        fused = PallasESMOE(m)
        fused.finalize(m.path)
        params["layers"][str(spec.i)] = {
            "routing": p["routing"],
            "banks": {"dw": dw, "pw": pw, "pb": pb, "gamma": gamma, "beta": beta},
        }
        spec.module = fused
    return params
