"""Hyperparameter tuner: mutation-based evolution over short train runs
(reference: ultralytics/engine/tuner.py, 615 LoC — mutate from the best
parents, train, track fitness, keep a CSV of the population)."""

from __future__ import annotations

import csv
import random
from pathlib import Path
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from ..utils import LOGGER

# (min, max, mutation sigma as fraction of range) — reference tuner space
SEARCH_SPACE: Dict[str, Tuple[float, float]] = {
    "lr0": (1e-5, 0.1),
    "lrf": (0.01, 1.0),
    "momentum": (0.6, 0.98),
    "weight_decay": (0.0, 0.001),
    "warmup_epochs": (0.0, 5.0),
    "box": (0.02, 10.0),
    "cls": (0.2, 4.0),
    "dfl": (0.4, 6.0),
    "hsv_h": (0.0, 0.1),
    "hsv_s": (0.0, 0.9),
    "hsv_v": (0.0, 0.9),
    "fliplr": (0.0, 1.0),
    "mosaic": (0.0, 1.0),
    "scale": (0.0, 0.9),
    "translate": (0.0, 0.9),
}


class Tuner:
    def __init__(self, train_fn: Callable[[Dict[str, float]], float], save_dir: str = "runs/tune",
                 space: Optional[Dict] = None, mutation_p: float = 0.5, sigma: float = 0.2, seed: int = 0):
        """train_fn(hyp) -> fitness. The reference wires this to a full
        model.train() run; tests can pass any objective."""
        self.train_fn = train_fn
        self.space = space or SEARCH_SPACE
        self.mutation_p = mutation_p
        self.sigma = sigma
        self.rng = random.Random(seed)
        self.save_dir = Path(save_dir)
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.history: List[Tuple[float, Dict[str, float]]] = []

    def _default_hyp(self) -> Dict[str, float]:
        defaults = {"lr0": 0.01, "lrf": 0.01, "momentum": 0.937, "weight_decay": 5e-4,
                    "warmup_epochs": 3.0, "box": 7.5, "cls": 0.5, "dfl": 1.5,
                    "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4, "fliplr": 0.5,
                    "mosaic": 1.0, "scale": 0.5, "translate": 0.1}
        return {k: defaults.get(k, (lo + hi) / 2) for k, (lo, hi) in self.space.items()}

    def _mutate(self, parent: Dict[str, float]) -> Dict[str, float]:
        """Gaussian mutation of a random subset of keys (reference tuner mutate)."""
        child = dict(parent)
        mutated = False
        for key, (lo, hi) in self.space.items():
            if self.rng.random() < self.mutation_p:
                span = hi - lo
                child[key] = float(np.clip(parent[key] + self.rng.gauss(0, self.sigma) * span, lo, hi))
                mutated = True
        if not mutated:  # guarantee progress
            key = self.rng.choice(list(self.space))
            lo, hi = self.space[key]
            child[key] = float(np.clip(parent[key] + self.rng.gauss(0, self.sigma) * (hi - lo), lo, hi))
        return child

    def _select_parent(self) -> Dict[str, float]:
        """Fitness-weighted choice among the top-5 (reference tuner parent selection)."""
        top = sorted(self.history, key=lambda t: -t[0])[:5]
        weights = [max(f, 1e-6) for f, _ in top]
        return self.rng.choices([h for _, h in top], weights=weights)[0]

    def __call__(self, iterations: int = 10) -> Dict[str, float]:
        for i in range(iterations):
            hyp = self._default_hyp() if not self.history else self._mutate(self._select_parent())
            fitness = float(self.train_fn(hyp))
            self.history.append((fitness, hyp))
            LOGGER.info(f"tune {i + 1}/{iterations}: fitness {fitness:.4f}")
        self._save_csv()
        best = max(self.history, key=lambda t: t[0])
        LOGGER.info(f"best fitness {best[0]:.4f}: {best[1]}")
        return best[1]

    def _save_csv(self):
        path = self.save_dir / "tune_results.csv"
        keys = list(self.space)
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["fitness", *keys])
            for fit, hyp in self.history:
                w.writerow([fit, *[hyp[k] for k in keys]])
