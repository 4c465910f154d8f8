"""Semantic image search (reference: ultralytics/solutions/similarity_search.py
VisualAISearch — CLIP embeddings + cosine retrieval over an image folder).

Offline-first design: the reference downloads CLIP; this image has zero
egress, so the encoder is pluggable with graceful degradation:
  * image queries — visual similarity over deterministic color+gradient
    signature embeddings (always available), or CLIP image embeddings when a
    local checkpoint is supplied;
  * text queries — CLIP joint space when local weights exist; otherwise the
    hashed-n-gram text encoder matched against filename/caption text (exact
    behavior documented, no silent wrong answers).

The embedding index is cached next to the data directory as .npy pairs,
exactly like the reference (index_path/data_path_npy).
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from ..utils import LOGGER

IMG_FORMATS = {".bmp", ".jpg", ".jpeg", ".png", ".tif", ".tiff", ".webp"}


def signature_embed(images: Sequence[np.ndarray], dim: int = 256, seed: int = 0) -> np.ndarray:
    """Deterministic visual signature: 3x(8x8) downsampled color planes +
    gradient-orientation histogram, Gaussian-projected to ``dim`` and
    L2-normalized. No learned weights — similar images land near each other."""
    import cv2

    feats = []
    for im in images:
        g = cv2.cvtColor(im, cv2.COLOR_BGR2GRAY)
        small = cv2.resize(im, (8, 8)).astype(np.float32).reshape(-1) / 255.0  # 192
        gx = cv2.Sobel(g, cv2.CV_32F, 1, 0)
        gy = cv2.Sobel(g, cv2.CV_32F, 0, 1)
        mag = np.sqrt(gx ** 2 + gy ** 2)
        ang = np.arctan2(gy, gx)
        hist, _ = np.histogram(ang, bins=32, range=(-np.pi, np.pi), weights=mag)
        hist = hist / max(hist.sum(), 1e-6)
        feats.append(np.concatenate([small, hist.astype(np.float32)]))
    X = np.stack(feats)
    rng = np.random.default_rng(seed)
    proj = rng.normal(0, 1.0 / np.sqrt(X.shape[1]), (X.shape[1], dim)).astype(np.float32)
    emb = X @ proj
    return emb / np.maximum(np.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)


class VisualAISearch:
    """Folder indexer + cosine search (reference similarity_search.py:20)."""

    def __init__(self, data: str = "images", image_encoder: Optional[Callable] = None,
                 text_encoder: Optional[object] = None, embed_dim: int = 256):
        self.data_dir = Path(data)
        self.image_encoder = image_encoder or (lambda ims: signature_embed(ims, embed_dim))
        if text_encoder is None:
            from ..nn.text_model import HashTextEncoder

            text_encoder = HashTextEncoder(embed=embed_dim)
        self.text_encoder = text_encoder
        self.joint_space = image_encoder is not None  # CLIP-style joint embedding
        self.index_path = self.data_dir / "ymt_index.npy"
        self.paths_path = self.data_dir / "ymt_paths.npy"
        self.index: Optional[np.ndarray] = None
        self.image_paths: List[str] = []
        self.load_or_build_index()

    def _images(self) -> List[Path]:
        return sorted(p for p in self.data_dir.rglob("*") if p.suffix.lower() in IMG_FORMATS)

    def load_or_build_index(self):
        if self.index_path.exists() and self.paths_path.exists():
            self.index = np.load(self.index_path)
            self.image_paths = list(np.load(self.paths_path))
            if len(self.image_paths) == len(self._images()):
                return
        import cv2

        files = self._images()
        if not files:
            self.index = np.zeros((0, 1), np.float32)
            self.image_paths = []
            return
        ims = [cv2.imread(str(f)) for f in files]
        self.index = self.image_encoder(ims)
        self.image_paths = [str(f) for f in files]
        np.save(self.index_path, self.index)
        np.save(self.paths_path, np.array(self.image_paths))
        LOGGER.info(f"VisualAISearch: indexed {len(files)} images from {self.data_dir}")

    # -- queries ---------------------------------------------------------------
    def search_image(self, image: np.ndarray, k: int = 10) -> List[Tuple[str, float]]:
        q = self.image_encoder([image])[0]
        return self._topk(q, k)

    def search_text(self, query: str, k: int = 10) -> List[Tuple[str, float]]:
        if self.joint_space:
            q = np.asarray(self.text_encoder.encode_text([query]))[0]
            return self._topk(q, k)
        # no joint space offline: rank by filename/caption text similarity
        names = [Path(p).stem.replace("_", " ").replace("-", " ") for p in self.image_paths]
        if not names:
            return []
        embs = np.asarray(self.text_encoder.encode_text(names))
        q = np.asarray(self.text_encoder.encode_text([query]))[0]
        sims = embs @ q
        order = np.argsort(-sims)[:k]
        return [(self.image_paths[i], float(sims[i])) for i in order]

    def search(self, query, k: int = 10) -> List[Tuple[str, float]]:
        """query: str (text) or ndarray (image)."""
        if isinstance(query, np.ndarray):
            return self.search_image(query, k)
        return self.search_text(str(query), k)

    __call__ = search

    def _topk(self, q: np.ndarray, k: int) -> List[Tuple[str, float]]:
        if self.index is None or not len(self.index):
            return []
        sims = self.index @ (q / max(np.linalg.norm(q), 1e-12))
        order = np.argsort(-sims)[:k]
        return [(self.image_paths[i], float(sims[i])) for i in order]


class SearchApp:
    """Browser search UI (reference similarity_search.py SearchApp uses
    Flask; neither flask nor streamlit ships here, so this serves the same
    one-page search over http.server)."""

    def __init__(self, data: str = "images", port: int = 7870):
        self.searcher = VisualAISearch(data)
        self.port = port

    def run(self, serve_forever: bool = True):
        import json
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
        from urllib.parse import parse_qs, urlparse

        searcher = self.searcher

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                u = urlparse(self.path)
                if u.path == "/search":
                    q = parse_qs(u.query).get("q", [""])[0]
                    body = json.dumps(searcher.search(q, k=10)).encode()
                    ctype = "application/json"
                else:
                    body = (b"<form action=/search><input name=q>"
                            b"<button>Search</button></form>")
                    ctype = "text/html"
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.end_headers()
                self.wfile.write(body)

        httpd = ThreadingHTTPServer(("127.0.0.1", self.port), Handler)
        LOGGER.info(f"SearchApp on http://127.0.0.1:{httpd.server_address[1]}")
        if serve_forever:  # pragma: no cover
            httpd.serve_forever()
        return httpd
