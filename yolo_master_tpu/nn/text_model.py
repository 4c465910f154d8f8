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
    if name == "jax-clip":
        return JaxCLIPText.from_hf(kw.pop("path", "openai/clip-vit-base-patch32"))
    if name.startswith("clip"):
        return TransformersCLIPText(kw.pop("path", "openai/clip-vit-base-patch32"))
    raise ValueError(f"unknown text encoder '{name}'")


class JaxCLIPText:
    """TPU-native CLIP text tower (reference nn/text_model.py:48 CLIP — but
    the encoding runs in jax, not torch): token+position embeddings, causal
    pre-LN transformer, final LN, projection, L2 norm.

    Weights import from a HuggingFace CLIPTextModelWithProjection state_dict
    (:meth:`from_hf`), so any local CLIP checkpoint drives open-vocabulary
    detection end-to-end on TPU. Tokenization needs a tokenizer callable
    (texts -> (ids [K, T], eos_index [K])) — the HF tokenizer when local
    files exist, else feed token ids directly via :meth:`encode_tokens`.

    Pooling note: HF's legacy configs declare eos_token_id=2 and pool at
    argmax(input_ids) (the real eos 49407 is the max id, so it works);
    we pool at the tokenizer's actual eos position — equivalent for real
    CLIP vocabularies, and correct for non-legacy configs."""

    def __init__(self, params: dict, num_heads: int, eos_token_id: int = 2, act: str = "quick_gelu",
                 tokenizer=None):
        self.p = params
        self.num_heads = num_heads
        self.eos_token_id = eos_token_id
        self.act = act
        self.tokenizer = tokenizer
        import jax

        self._jit = jax.jit(self._forward)

    @classmethod
    def from_hf(cls, model_name_or_path: str):
        """Load a local HF CLIP checkpoint and convert (no network)."""
        from transformers import CLIPTextModelWithProjection, CLIPTokenizer

        m = CLIPTextModelWithProjection.from_pretrained(model_name_or_path, local_files_only=True)
        try:
            tok = CLIPTokenizer.from_pretrained(model_name_or_path, local_files_only=True)
        except Exception:  # noqa: BLE001 — tokenizer files optional
            tok = None
        enc = cls.from_hf_model(m)
        if tok is not None:
            eos = tok.eos_token_id

            def tokenize(texts):
                out = tok(list(texts), padding=True, return_tensors="np")
                ids = out["input_ids"]
                return ids, (ids == eos).argmax(-1)

            enc.tokenizer = tokenize
        return enc

    @classmethod
    def from_hf_model(cls, m) -> "JaxCLIPText":
        """Convert an in-memory CLIPTextModelWithProjection (state_dict walk —
        the same mechanical import style as utils/torch_import.py)."""
        import jax.numpy as jnp

        sd = {k: np.asarray(v.detach().cpu().numpy()) for k, v in m.state_dict().items()}
        cfg = m.config
        pre = "text_model."
        p = {
            "tok": sd[pre + "embeddings.token_embedding.weight"],
            "pos": sd[pre + "embeddings.position_embedding.weight"],
            "ln_f_w": sd[pre + "final_layer_norm.weight"],
            "ln_f_b": sd[pre + "final_layer_norm.bias"],
            "proj": sd["text_projection.weight"].T,  # torch Linear stores [out, in]
            "layers": [],
        }
        i = 0
        while f"{pre}encoder.layers.{i}.self_attn.q_proj.weight" in sd:
            base = f"{pre}encoder.layers.{i}."
            lyr = {}
            for name, key in (("q", "self_attn.q_proj"), ("k", "self_attn.k_proj"),
                              ("v", "self_attn.v_proj"), ("o", "self_attn.out_proj"),
                              ("fc1", "mlp.fc1"), ("fc2", "mlp.fc2")):
                lyr[name + "_w"] = sd[base + key + ".weight"].T
                lyr[name + "_b"] = sd[base + key + ".bias"]
            for name, key in (("ln1", "layer_norm1"), ("ln2", "layer_norm2")):
                lyr[name + "_w"] = sd[base + key + ".weight"]
                lyr[name + "_b"] = sd[base + key + ".bias"]
            p["layers"].append(lyr)
            i += 1
        params = _tree_to_jnp(p)
        return cls(params, num_heads=cfg.num_attention_heads, eos_token_id=cfg.eos_token_id,
                   act=cfg.hidden_act)

    # -- forward ---------------------------------------------------------------
    def _forward(self, ids, eos_idx):
        import jax
        import jax.numpy as jnp

        p = self.p
        K, T = ids.shape
        D = p["tok"].shape[1]
        H = self.num_heads

        def ln(x, w, b):
            mu = x.mean(-1, keepdims=True)
            var = jnp.var(x, -1, keepdims=True)
            return (x - mu) / jnp.sqrt(var + 1e-5) * w + b

        def act(x):
            if self.act == "quick_gelu":
                return x * jax.nn.sigmoid(1.702 * x)
            return jax.nn.gelu(x)

        x = p["tok"][ids] + p["pos"][:T]
        causal = jnp.tril(jnp.ones((T, T), bool))
        for lyr in p["layers"]:
            h = ln(x, lyr["ln1_w"], lyr["ln1_b"])
            q = (h @ lyr["q_w"] + lyr["q_b"]).reshape(K, T, H, D // H)
            k = (h @ lyr["k_w"] + lyr["k_b"]).reshape(K, T, H, D // H)
            v = (h @ lyr["v_w"] + lyr["v_b"]).reshape(K, T, H, D // H)
            logits = jnp.einsum("kqhd,kthd->khqt", q, k) / np.sqrt(D // H)
            logits = jnp.where(causal[None, None], logits, -1e9)
            attn = jax.nn.softmax(logits, -1)
            o = jnp.einsum("khqt,kthd->kqhd", attn, v).reshape(K, T, D)
            x = x + o @ lyr["o_w"] + lyr["o_b"]
            h = ln(x, lyr["ln2_w"], lyr["ln2_b"])
            x = x + act(h @ lyr["fc1_w"] + lyr["fc1_b"]) @ lyr["fc2_w"] + lyr["fc2_b"]
        x = ln(x, p["ln_f_w"], p["ln_f_b"])
        pooled = x[jnp.arange(K), eos_idx]
        emb = pooled @ p["proj"]
        return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)

    def encode_tokens(self, ids: np.ndarray, eos_idx: np.ndarray) -> np.ndarray:
        return np.asarray(self._jit(np.asarray(ids), np.asarray(eos_idx)), np.float32)

    def encode_text(self, texts: Sequence[str]) -> np.ndarray:
        if self.tokenizer is None:
            raise RuntimeError("no tokenizer attached; use encode_tokens or from_hf with tokenizer files")
        ids, eos = self.tokenizer(texts)
        return self.encode_tokens(ids, eos)

    __call__ = encode_text


def _tree_to_jnp(tree):
    import jax.numpy as jnp

    if isinstance(tree, dict):
        return {k: _tree_to_jnp(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_tree_to_jnp(v) for v in tree]
    return jnp.asarray(tree)
