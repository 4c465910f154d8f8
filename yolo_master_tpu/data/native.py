"""ctypes bridge to the native preprocessing library
(deploy/cpp/src/ymt_preprocess.cpp -> libymt_preprocess.so).

Host preprocessing is the serving bottleneck on TPU: the fused normalize +
space-to-depth blob reorder costs ~6.4 ms/frame in numpy vs ~1.1 ms of device
time. The C path fuses BGR->RGB + /255 + blob layout into one OpenMP pass.
Falls back to the numpy twins transparently when the library isn't built
(build with ``python -m yolo_master_tpu.data.native`` or cmake)."""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

from ..utils import LOGGER

_SRC = Path(__file__).resolve().parents[2] / "deploy" / "cpp" / "src" / "ymt_preprocess.cpp"
_LIB_PATH = _SRC.parent / "libymt_preprocess.so"
_lib = None
_tried = False


def build_library(force: bool = False) -> Optional[Path]:
    """Compile the shared library with g++ (no cmake needed)."""
    if _LIB_PATH.exists() and not force:
        return _LIB_PATH
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           str(_SRC), "-o", str(_LIB_PATH)]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _LIB_PATH
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        LOGGER.warning(f"native preprocess build failed ({e}); using numpy fallback")
        return None


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = build_library()
    if path is None:
        return None
    lib = ctypes.CDLL(str(path))
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.ymt_nhwc_normalize.argtypes = [u8p, ctypes.c_int, ctypes.c_int, f32p]
    lib.ymt_s2d4_blob.argtypes = [u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p]
    lib.ymt_s2d4_blob_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p]
    lib.ymt_preprocess_version.restype = ctypes.c_int
    assert lib.ymt_preprocess_version() == 1
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def nhwc_normalize(bgr: np.ndarray) -> np.ndarray:
    """Letterboxed BGR uint8 [H,W,3] -> RGB float32 /255 [H,W,3]."""
    lib = _load()
    if lib is None:
        return bgr[..., ::-1].astype(np.float32) / 255.0
    bgr = np.ascontiguousarray(bgr)
    out = np.empty(bgr.shape, np.float32)
    lib.ymt_nhwc_normalize(bgr, bgr.shape[0], bgr.shape[1], out)
    return out


def s2d4_blob_from_bgr(bgr: np.ndarray) -> np.ndarray:
    """Letterboxed BGR uint8 [H,W,3] -> s2d4 blob [48, hb_pad, wq] float32
    (the ops/pallas_stem.py layout, RGB channel order)."""
    h, w = bgr.shape[:2]
    hb, wb = h // 4 + 2, w // 4 + 2
    hb_pad = ((hb + 15) // 16) * 16 + 16
    wq = ((wb + 127) // 128) * 128 + 128
    lib = _load()
    if lib is None:
        from ..ops.pallas_stem import s2d4_blob_np

        x = (bgr[..., ::-1].astype(np.float32) / 255.0).transpose(2, 0, 1)[None]
        return s2d4_blob_np(x)[0]
    bgr = np.ascontiguousarray(bgr)
    out = np.empty((48, hb_pad, wq), np.float32)
    lib.ymt_s2d4_blob(bgr, h, w, hb_pad, wq, out)
    return out


def s2d4_blob_u8_from_bgr(bgr: np.ndarray) -> np.ndarray:
    """Letterboxed BGR uint8 -> UINT8 s2d4 blob (no normalize; the /255 is
    folded into the stem weights — pallas_stem_fuse(uint8_input=True)).
    4x smaller host->device transfer than the float blob."""
    h, w = bgr.shape[:2]
    hb, wb = h // 4 + 2, w // 4 + 2
    hb_pad = ((hb + 15) // 16) * 16 + 16
    wq = ((wb + 127) // 128) * 128 + 128
    lib = _load()
    if lib is None:
        from ..ops.pallas_stem import s2d4_blob_np

        x = bgr[..., ::-1].astype(np.float32).transpose(2, 0, 1)[None]
        return s2d4_blob_np(x)[0].astype(np.uint8)
    bgr = np.ascontiguousarray(bgr)
    out = np.empty((48, hb_pad, wq), np.uint8)
    lib.ymt_s2d4_blob_u8(bgr, h, w, hb_pad, wq, out)
    return out


if __name__ == "__main__":
    p = build_library(force=True)
    print(f"built: {p}" if p else "build failed")
