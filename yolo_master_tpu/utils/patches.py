"""Robust IO wrappers (reference: ultralytics/utils/patches.py — unicode-safe
cv2 imread/imwrite monkey patches and torch_load/save retry).

Not monkey patches here: the repo calls these directly where robustness
matters (data loaders, Results.save, checkpoint writes)."""

from __future__ import annotations

import time
from pathlib import Path
from typing import Optional

import numpy as np

from . import LOGGER


def imread(path: str, flags: Optional[int] = None) -> Optional[np.ndarray]:
    """cv2.imread that survives non-ASCII paths (decode from a byte buffer —
    reference patches.py imread)."""
    import cv2

    try:
        data = np.fromfile(str(path), np.uint8)
    except (FileNotFoundError, OSError):
        return None
    if data.size == 0:
        return None
    return cv2.imdecode(data, cv2.IMREAD_COLOR if flags is None else flags)


def imwrite(path: str, img: np.ndarray) -> bool:
    """cv2.imwrite via imencode + tofile (unicode-safe, reference imwrite)."""
    import cv2

    try:
        ok, buf = cv2.imencode(Path(path).suffix or ".jpg", img)
        if not ok:
            return False
        buf.tofile(str(path))
        return True
    except Exception:  # noqa: BLE001
        return False


def save_with_retry(save_fn, path: str, retries: int = 3, delay: float = 0.5) -> str:
    """Run a file-writing callable with backoff retries (reference
    torch_save's _torch_save retry loop — transient NFS/flush failures)."""
    for attempt in range(retries):
        try:
            save_fn(path)
            return path
        except OSError as e:
            if attempt == retries - 1:
                raise
            LOGGER.warning(f"save failed ({e}); retry {attempt + 1}/{retries}")
            time.sleep(delay * 2**attempt)
    raise AssertionError("unreachable")
