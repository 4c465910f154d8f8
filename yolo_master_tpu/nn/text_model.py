"""Text encoders for open-vocabulary detection (reference:
ultralytics/nn/text_model.py:22 TextModel, :48 CLIP, :165 MobileCLIP).

Contract: an encoder maps a list of K class prompts to an L2-normalized
``[K, embed]`` float array aligned with the head's region embeddings. Any
callable satisfying that plugs into ``WorldModel.set_classes``.

This image has no CLIP weights and no network egress, so the default encoder
is :class:`HashTextEncoder` — a deterministic hashed character-n-gram
featurizer with a fixed random projection. It gives distinct, stable,
normalized embeddings per prompt (sufficient for the structural path:
vocabulary swapping, contrastive scoring, export); swap in
:class:`TransformersCLIPText` (or any real CLIP) when weights are available.
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence

import numpy as np


class HashTextEncoder:
    """Deterministic offline text encoder (documented stub contract).

    Features: hashed character 3-grams over the lowercase prompt -> sparse
    [vocab_bins] counts -> fixed Gaussian projection [vocab_bins, embed]
    (seeded) -> L2 normalization. Similar strings share n-grams and land near
    each other; distinct prompts separate.
    """

    def __init__(self, embed: int = 512, vocab_bins: int = 4096, seed: int = 0):
        self.embed = embed
        self.bins = vocab_bins
        rng = np.random.default_rng(seed)
        self.proj = rng.normal(0, 1.0 / np.sqrt(vocab_bins), (vocab_bins, embed)).astype(np.float32)

    def tokenize(self, texts: Sequence[str]) -> List[List[int]]:
        out = []
        for t in texts:
            t = f"  {t.strip().lower()}  "
            grams = [t[i : i + 3] for i in range(len(t) - 2)]
            out.append([int(hashlib.md5(g.encode()).hexdigest(), 16) % self.bins for g in grams])
        return out

    def encode_text(self, texts: Sequence[str]) -> np.ndarray:
        feats = np.zeros((len(texts), self.bins), np.float32)
        for i, toks in enumerate(self.tokenize(texts)):
            for tk in toks:
                feats[i, tk] += 1.0
        emb = feats @ self.proj
        return emb / np.maximum(np.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)

    __call__ = encode_text


class TransformersCLIPText:
    """CLIP text tower via HuggingFace transformers — requires local weights
    (reference CLIP/MobileCLIP encoders download theirs; this image has zero
    egress, so construction fails with a clear message unless a local
    checkpoint path is given)."""

    def __init__(self, model_name_or_path: str = "openai/clip-vit-base-patch32"):
        try:
            import torch  # noqa: F401
            from transformers import CLIPTextModelWithProjection, CLIPTokenizer
        except ImportError as e:  # pragma: no cover
            raise ImportError("TransformersCLIPText requires torch + transformers") from e
        try:
            self.tokenizer = CLIPTokenizer.from_pretrained(model_name_or_path, local_files_only=True)
            self.model = CLIPTextModelWithProjection.from_pretrained(model_name_or_path, local_files_only=True)
        except Exception as e:
            raise RuntimeError(
                f"no local CLIP weights at '{model_name_or_path}' (offline image); "
                "pass a local checkpoint dir or use HashTextEncoder"
            ) from e
        self.model.eval()

    def encode_text(self, texts: Sequence[str]) -> np.ndarray:
        import torch

        with torch.no_grad():
            toks = self.tokenizer(list(texts), padding=True, return_tensors="pt")
            emb = self.model(**toks).text_embeds
            emb = torch.nn.functional.normalize(emb, dim=-1)
        return emb.cpu().numpy().astype(np.float32)

    __call__ = encode_text


def build_text_encoder(name: str = "hash", embed: int = 512, **kw):
    """Encoder factory (reference build_text_model)."""
    if name == "hash":
        return HashTextEncoder(embed=embed, **kw)
    if name.startswith("clip"):
        return TransformersCLIPText(kw.pop("path", "openai/clip-vit-base-patch32"))
    raise ValueError(f"unknown text encoder '{name}'")
