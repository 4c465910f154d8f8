"""Inference source loaders (reference: ultralytics/data/loaders.py:53-565 —
LoadImagesAndVideos, LoadStreams, LoadScreenshots, LoadPilAndNumpy, LoadTensor).

Each loader is an iterator of ``SourceFrame(path, image_bgr, frame_idx,
total_frames, stream)`` — the predictor batches frames through its one jitted
graph regardless of origin. Video decode stays on host (cv2); the TPU sees
only fixed-shape letterboxed batches.
"""

from __future__ import annotations

import glob
import math
import threading
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Iterator, List, Optional, Union

import numpy as np

IMG_FORMATS = {"bmp", "jpeg", "jpg", "png", "tif", "tiff", "webp", "pfm", "dng", "mpo", "heic"}
VID_FORMATS = {"asf", "avi", "gif", "m4v", "mkv", "mov", "mp4", "mpeg", "mpg", "ts", "wmv", "webm"}


@dataclass
class SourceFrame:
    path: str
    image: np.ndarray  # BGR HWC uint8
    frame_idx: int = 0
    total_frames: int = 1
    stream: bool = False


def _is_url(s: str) -> bool:
    return s.startswith(("rtsp://", "rtmp://", "http://", "https://", "tcp://"))


class LoadImagesAndVideos:
    """Files / dirs / globs of images and videos (reference loaders.py:203-378).

    Videos are decoded frame-by-frame with cv2.VideoCapture, honoring
    ``vid_stride`` (sample every Nth frame).
    """

    def __init__(self, source: Union[str, Path, List], vid_stride: int = 1):
        self.vid_stride = max(int(vid_stride), 1)
        self.files: List[str] = []
        for item in source if isinstance(source, (list, tuple)) else [source]:
            s = str(item)
            p = Path(s)
            if p.is_dir():
                self.files += sorted(
                    str(f) for f in p.rglob("*") if f.suffix.lower().lstrip(".") in IMG_FORMATS | VID_FORMATS
                )
            elif any(ch in s for ch in "*?["):
                self.files += sorted(glob.glob(s, recursive=True))
            elif p.exists():
                self.files.append(s)
            else:
                raise FileNotFoundError(f"source not found: {s}")
        if not self.files:
            raise FileNotFoundError(f"no images/videos under {source}")

    def __iter__(self) -> Iterator[SourceFrame]:
        import cv2

        for path in self.files:
            suffix = Path(path).suffix.lower().lstrip(".")
            if suffix in VID_FORMATS:
                cap = cv2.VideoCapture(path)
                if not cap.isOpened():
                    raise RuntimeError(f"cannot open video {path}")
                total = max(int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) // self.vid_stride, 1)
                idx = 0
                out_idx = 0
                while True:
                    ok = cap.grab()
                    if not ok:
                        break
                    if idx % self.vid_stride == 0:
                        ok, frame = cap.retrieve()
                        if not ok:
                            break
                        yield SourceFrame(path, frame, out_idx, total)
                        out_idx += 1
                    idx += 1
                cap.release()
            else:
                im = cv2.imread(path)
                if im is None:
                    raise FileNotFoundError(f"image unreadable: {path}")
                yield SourceFrame(path, im)


class LoadStreams:
    """Threaded live-stream reader: RTSP/RTMP/HTTP URLs or webcam indices
    (reference loaders.py:53-202). A daemon thread per source keeps only the
    freshest frame (buffer=1 semantics); iteration yields the latest frame of
    every live source each tick.
    """

    def __init__(self, sources: Union[str, List[str]], vid_stride: int = 1, buffer: bool = False, max_frames: Optional[int] = None):
        import cv2

        if isinstance(sources, str):
            sources = [s.strip() for s in sources.split(",") if s.strip()] if "," in sources else [sources]
        self.sources = [int(s) if str(s).isnumeric() else s for s in sources]
        self.vid_stride = max(int(vid_stride), 1)
        self.buffer = buffer
        self.max_frames = max_frames
        self.caps = []
        self.frames: List[Optional[np.ndarray]] = [None] * len(self.sources)
        self.locks = [threading.Lock() for _ in self.sources]
        self.running = True
        self.threads = []
        for i, s in enumerate(self.sources):
            cap = cv2.VideoCapture(s)
            if not cap.isOpened():
                raise RuntimeError(f"cannot open stream {s}")
            self.caps.append(cap)
            ok, frame = cap.read()
            if not ok:
                raise RuntimeError(f"stream {s} returned no frame")
            self.frames[i] = frame
            t = threading.Thread(target=self._reader, args=(i,), daemon=True)
            t.start()
            self.threads.append(t)

    def _reader(self, i: int):
        n = 0
        cap = self.caps[i]
        while self.running and cap.isOpened():
            n += 1
            cap.grab()
            if n % self.vid_stride == 0:
                ok, frame = cap.retrieve()
                if not ok:
                    break
                with self.locks[i]:
                    self.frames[i] = frame
            time.sleep(0.0)
        self.running = False

    def __iter__(self) -> Iterator[List[SourceFrame]]:
        count = 0
        while self.running:
            out = []
            for i, s in enumerate(self.sources):
                with self.locks[i]:
                    frame = None if self.frames[i] is None else self.frames[i].copy()
                if frame is None:
                    continue
                out.append(SourceFrame(str(s), frame, count, -1, stream=True))
            if not out:
                break
            yield out
            count += 1
            if self.max_frames is not None and count >= self.max_frames:
                break

    def close(self):
        self.running = False
        for cap in self.caps:
            cap.release()


class LoadScreenshots:
    """Screen capture via mss (reference loaders.py:379-443); gated on the
    optional dependency."""

    def __init__(self, source: str = "screen", max_frames: Optional[int] = None):
        try:
            import mss  # noqa: F401
        except ImportError as e:  # pragma: no cover - mss absent in this image
            raise ImportError("LoadScreenshots requires the 'mss' package") from e
        self.max_frames = max_frames
        parts = str(source).split()
        self.monitor_idx = int(parts[1]) if len(parts) > 1 else 1

    def __iter__(self) -> Iterator[SourceFrame]:
        import mss

        with mss.mss() as sct:
            mon = sct.monitors[self.monitor_idx]
            n = 0
            while self.max_frames is None or n < self.max_frames:
                im = np.asarray(sct.grab(mon))[..., :3]  # BGRA -> BGR
                yield SourceFrame(f"screen{self.monitor_idx}", np.ascontiguousarray(im), n, -1, stream=True)
                n += 1


class LoadPilAndNumpy:
    """In-memory PIL images / numpy arrays (reference loaders.py:444-500)."""

    def __init__(self, source):
        items = source if isinstance(source, (list, tuple)) else [source]
        self.images = [self._to_bgr(im, i) for i, im in enumerate(items)]

    @staticmethod
    def _to_bgr(im, i) -> SourceFrame:
        if hasattr(im, "mode"):  # PIL
            arr = np.asarray(im.convert("RGB"))[..., ::-1]
            return SourceFrame(f"pil{i}", np.ascontiguousarray(arr))
        arr = np.asarray(im)
        if arr.ndim != 3 or arr.shape[-1] != 3:
            raise ValueError(f"expected HWC 3-channel array, got {arr.shape}")
        return SourceFrame(f"array{i}", np.ascontiguousarray(arr))

    def __iter__(self) -> Iterator[SourceFrame]:
        return iter(self.images)


class LoadTensor:
    """Pre-batched NCHW/NHWC float tensors (torch or jax/np) already scaled to
    [0,1] (reference loaders.py:501-565). Converts back to BGR uint8 frames so
    the normal preprocess contract applies."""

    def __init__(self, tensor):
        arr = np.asarray(tensor)
        if arr.ndim == 3:
            arr = arr[None]
        if arr.ndim != 4:
            raise ValueError(f"expected 3/4-D tensor, got {arr.shape}")
        if arr.shape[1] in (1, 3) and arr.shape[-1] not in (1, 3):  # NCHW -> NHWC
            arr = arr.transpose(0, 2, 3, 1)
        if arr.dtype != np.uint8:
            if arr.max() > 1.5:
                raise ValueError("float tensors must be scaled to [0,1]")
            arr = (arr * 255).astype(np.uint8)
        self.frames = [SourceFrame(f"tensor{i}", np.ascontiguousarray(a[..., ::-1])) for i, a in enumerate(arr)]

    def __iter__(self) -> Iterator[SourceFrame]:
        return iter(self.frames)


def load_inference_source(source: Any, vid_stride: int = 1, stream_frames: Optional[int] = None):
    """Source dispatch (reference data/build.py:425 load_inference_source)."""
    if isinstance(source, (np.ndarray,)) or hasattr(source, "mode"):
        return LoadPilAndNumpy(source)
    if hasattr(source, "shape") and not isinstance(source, np.ndarray):  # torch/jax tensor
        return LoadTensor(source)
    if isinstance(source, (list, tuple)) and source and (isinstance(source[0], np.ndarray) or hasattr(source[0], "mode")):
        return LoadPilAndNumpy(source)
    s = str(source)
    if s.isnumeric() or _is_url(s):
        return LoadStreams(s, vid_stride=vid_stride, max_frames=stream_frames)
    if s.startswith("screen"):
        return LoadScreenshots(s, max_frames=stream_frames)
    return LoadImagesAndVideos(source, vid_stride=vid_stride)
