"""Training recovery controller (reference: ultralytics/engine/extensions/
recovery.py:23-370 TrainingRecoveryController + trainer.py:1392
_handle_nan_recovery).

Coordinated failure handling for long runs:
  * keep a rolling "healthy" checkpoint, refreshed after each finite epoch
  * validate candidate checkpoints with a forward smoke test before trusting
  * on a non-finite epoch (the step-level skip already guards single steps),
    restore weights/EMA from the last healthy state and continue

The multi-rank parts of the reference (rank-synced non-finite flags, EMA
buffer resync) are free here: the jitted step computes the finite flag from
the GLOBAL sharded batch, so every shard of the single program agrees by
construction (SURVEY.md §2.7 mapping).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.module import Context
from ..utils import LOGGER


class TrainingRecoveryController:
    def __init__(self, model, save_dir: str, smoke_imgsz: int = 64, keep_on_disk: bool = True):
        self.model = model
        self.save_dir = Path(save_dir)
        self.smoke_imgsz = smoke_imgsz
        self.keep_on_disk = keep_on_disk
        self.healthy_state = None
        self.healthy_epoch = -1
        self.recoveries = 0

    def _forward_smoke(self, params) -> bool:
        """Checkpoint forward-smoke validation (reference recovery.py:206)."""
        try:
            x = jnp.full((1, self.smoke_imgsz, self.smoke_imgsz, 3), 0.5, jnp.float32)
            out = self.model.forward_predict(params, x, Context(training=False))
            return bool(jnp.all(jnp.isfinite(out)))
        except Exception as e:  # noqa: BLE001
            LOGGER.warning(f"recovery smoke test failed: {e}")
            return False

    def refresh(self, state, epoch: int, metrics: Optional[dict] = None) -> bool:
        """Adopt the current TrainState as healthy if its weights pass the smoke
        test and the epoch metrics are finite."""
        if metrics is not None and not all(np.isfinite(v) for v in metrics.values() if np.isscalar(v)):
            return False
        if not self._forward_smoke(state.params):
            return False
        self.healthy_state = jax.tree_util.tree_map(jnp.copy, state)
        self.healthy_epoch = epoch
        if self.keep_on_disk:
            from ..utils.checkpoint import save_params_npz

            save_params_npz(state.ema_params, self.save_dir / "healthy.npz")
        return True

    def maybe_recover(self, state, metrics: dict):
        """Restore the last healthy state when the epoch went non-finite
        (reference trainer.py:1392 _handle_nan_recovery). Returns (state, recovered)."""
        finite = all(np.isfinite(v) for v in metrics.values() if np.isscalar(v))
        if finite:
            return state, False
        if self.healthy_state is None:
            LOGGER.warning("non-finite epoch but no healthy checkpoint yet — continuing")
            return state, False
        self.recoveries += 1
        LOGGER.warning(
            f"non-finite epoch metrics — restoring healthy checkpoint from epoch {self.healthy_epoch} "
            f"(recovery #{self.recoveries})"
        )
        restored = self.healthy_state
        # keep the optimizer step counter moving so LR schedules don't rewind
        return restored._replace(step=state.step), True
