"""Open-world label taxonomy + multimodal VLM fusion (reference parity:
agent/runtime/open_world/taxonomy.py and agent/runtime/multimodal/fusion.py,
recast compactly).

The reference pairs a VLM (scene describer / verifier) with the detector:
VLM-proposed open-vocabulary labels are canonicalized against a taxonomy
(aliases -> canonical names, generic labels dropped, token-overlap matching),
and its per-box verdicts are fused with the detector's boxes (suppress
rejected detections, add verified proposals that the detector missed).
No VLM ships in this image — callers inject proposals/verdicts as data,
which is also the reference's wire format (JSON proposal dicts).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Iterable, List, Optional, Tuple

__all__ = [
    "normalize_label",
    "Taxonomy",
    "fuse_detections",
    "open_world_comparison",
    "DEFAULT_ALIASES",
    "GENERIC_LABELS",
]

# seed alias map (reference taxonomy.py DEFAULT_OPEN_WORLD_LABEL_ALIASES);
# callers extend per deployment
DEFAULT_ALIASES: Dict[str, str] = {
    "lunch box": "bento box",
    "lunchbox": "bento box",
    "meal box": "bento box",
    "flower bouquet": "flower arrangement",
    "bouquet": "flower arrangement",
    "flowers": "flower arrangement",
    "tree trunk": "log",
    "fallen tree": "log",
}

# labels too generic to score (reference OPEN_WORLD_GENERIC_LABELS)
GENERIC_LABELS = {
    "food", "meal", "dish", "object", "objects", "container",
    "scene", "outdoor scene", "indoor scene",
}


def normalize_label(label: Any) -> str:
    """Lowercase, collapse whitespace, strip punctuation noise and plural 's'
    on the last token (reference normalize_open_world_label_text)."""
    s = re.sub(r"\s+", " ", str(label or "").strip().lower())
    s = re.sub(r"[_\-/]", " ", s).strip()
    toks = s.split(" ")
    if toks and len(toks[-1]) > 3 and toks[-1].endswith("s") and not toks[-1].endswith("ss"):
        toks[-1] = toks[-1][:-1]
    return " ".join(toks)


def _tokens(label: str) -> set:
    return set(normalize_label(label).split())


class Taxonomy:
    """Canonicalize open-vocabulary labels against a class vocabulary.

    Matching tiers (reference taxonomy_match_score): exact canonical hit
    (1.0) > alias hit (0.9) > token-set containment (0.75) > token Jaccard
    overlap (scaled <=0.6). Generic labels canonicalize to ''.
    """

    def __init__(self, vocabulary: Iterable[str], aliases: Optional[Dict[str, str]] = None):
        self.vocab = [normalize_label(v) for v in vocabulary]
        self._vocab_set = set(self.vocab)
        self.aliases = {normalize_label(k): normalize_label(v) for k, v in {**DEFAULT_ALIASES, **(aliases or {})}.items()}
        self._vocab_tokens = {v: _tokens(v) for v in self.vocab}

    def canonicalize(self, label: Any) -> Tuple[str, float, str]:
        """Return (canonical_label, score, method). '' when unmatched/generic."""
        n = normalize_label(label)
        if not n or n in GENERIC_LABELS:
            return "", 0.0, "generic"
        if n in self._vocab_set:
            return n, 1.0, "exact"
        a = self.aliases.get(n)
        if a and a in self._vocab_set:
            return a, 0.9, "alias"
        lt = _tokens(n)
        best, best_score = "", 0.0
        for v, vt in self._vocab_tokens.items():
            if not vt:
                continue
            if vt <= lt or lt <= vt:
                score = 0.75
            else:
                inter = len(lt & vt)
                score = 0.6 * inter / len(lt | vt) if inter else 0.0
            if score > best_score:
                best, best_score = v, score
        if best_score >= 0.5:
            return best, best_score, "tokens"
        return "", 0.0, "unmatched"


def _iou_xyxy(a, b) -> float:
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua if ua > 0 else 0.0


def fuse_detections(
    detections: List[dict],
    proposals: List[dict],
    iou_threshold: float = 0.7,
    min_add_confidence: float = 0.3,
    suppress_below: float = 0.25,
) -> dict:
    """Fuse detector boxes with VLM proposals/verdicts (reference
    build_multimodal_fusion_preview semantics).

    detections: [{box: xyxy, label, conf}]; proposals: [{box: xyxy, label,
    confidence?, verdict?: 'add'|'suppress'|'relabel'}].

    Rules:
      * 'suppress' verdict drops the overlapping detection only when the
        detector itself was unsure (conf < suppress_below)
      * 'relabel' replaces the label of the best-overlapping detection
      * 'add' (or verdict-less) proposals append when confident enough and
        not duplicating an existing box (IoU < iou_threshold)

    Returns {kept, added, suppressed, fused} with fused = kept + added.
    """
    kept = [dict(d) for d in detections]
    suppressed: List[dict] = []
    added: List[dict] = []
    for prop in proposals:
        pbox = prop.get("box")
        verdict = str(prop.get("verdict", "add")).lower()
        if pbox is None:
            continue
        overlaps = [(i, _iou_xyxy(pbox, d["box"])) for i, d in enumerate(kept)]
        best_i, best_iou = max(overlaps, key=lambda t: t[1], default=(None, 0.0))
        if verdict == "suppress" and best_i is not None and best_iou >= iou_threshold:
            if float(kept[best_i].get("conf", 0.0)) < suppress_below:
                suppressed.append(kept.pop(best_i))
            continue
        if verdict == "relabel" and best_i is not None and best_iou >= iou_threshold:
            kept[best_i]["label"] = prop.get("label", kept[best_i].get("label"))
            kept[best_i]["relabeled"] = True
            continue
        if verdict in ("add", "relabel"):
            conf = float(prop.get("confidence", 1.0))
            if conf >= min_add_confidence and best_iou < iou_threshold:
                added.append({"box": list(pbox), "label": prop.get("label", ""), "conf": conf, "source": "vlm"})
    return {"kept": kept, "added": added, "suppressed": suppressed, "fused": kept + added}


def open_world_comparison(
    predictions: List[dict],
    ground_truth: List[dict],
    taxonomy: Optional[Taxonomy] = None,
    iou_threshold: float = 0.5,
) -> dict:
    """Open-world label evaluation (reference build_open_world_comparison_entry
    + aggregate_open_world_comparison): canonicalize both label sets through
    the taxonomy, greedily match boxes by IoU, and score label agreement.

    Returns {matched, label_hits, precision, recall, per_label} where a hit
    requires IoU >= threshold AND canonical labels to agree.
    """
    tax = taxonomy or Taxonomy({normalize_label(g.get("label", "")) for g in ground_truth})
    preds = sorted(predictions, key=lambda p: -float(p.get("conf", 0.0)))
    taken = [False] * len(ground_truth)
    matched = label_hits = 0
    per_label: Dict[str, Dict[str, int]] = {}
    for p in preds:
        cp, _, _ = tax.canonicalize(p.get("label", ""))
        best_j, best_iou = None, 0.0
        for j, g in enumerate(ground_truth):
            if taken[j]:
                continue
            iou = _iou_xyxy(p["box"], g["box"])
            if iou > best_iou:
                best_j, best_iou = j, iou
        if best_j is not None and best_iou >= iou_threshold:
            taken[best_j] = True
            matched += 1
            cg, _, _ = tax.canonicalize(ground_truth[best_j].get("label", ""))
            row = per_label.setdefault(cg or "unmatched", {"hits": 0, "misses": 0})
            if cp and cp == cg:
                label_hits += 1
                row["hits"] += 1
            else:
                row["misses"] += 1
    n_pred, n_gt = len(predictions), len(ground_truth)
    return {
        "matched": matched,
        "label_hits": label_hits,
        "precision": label_hits / n_pred if n_pred else 0.0,
        "recall": label_hits / n_gt if n_gt else 0.0,
        "per_label": per_label,
    }
