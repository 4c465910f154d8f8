"""Detection trainer (reference: ultralytics/engine/trainer.py:164-1719 BaseTrainer).

Single-program TPU training: no subprocess relaunch, no DDP wrapper — the
jitted train step is sharded over a jax mesh (data axis) and XLA inserts all
collectives (SURVEY.md §2.7 mapping). Reproduced trainer behaviors:

  * warmup (warmup_epochs over steps, lr 0->lr0) + linear decay to lr0*lrf
  * SGD nesterov momentum 0.937, weight decay on conv weights only
  * EMA with ramped decay; validation + fitness on EMA weights
  * best/last checkpointing, early stopping (patience on fitness)
  * non-finite loss step-skip (functional NaN recovery, trainer.py:1392)
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.dataset import DataLoader, YOLODataset
from ..utils import LOGGER
from ..utils.checkpoint import save_params_npz, save_train_state
from .train_step import TrainState, make_optimizer, make_train_state, make_train_step
from .validator import DetectionValidator


class DetectionTrainer:
    def __init__(
        self,
        yolo,
        data: str,
        epochs: int = 100,
        batch: int = 16,
        imgsz: int = 640,
        lr0: float = 0.01,
        lrf: float = 0.01,
        momentum: float = 0.937,
        weight_decay: float = 5e-4,
        warmup_epochs: float = 3.0,
        max_gt: int = 128,
        patience: int = 100,
        save_dir: str = "runs/train",
        mesh=None,
        val: bool = True,
        seed: int = 0,
        hyp: Optional[Dict] = None,
        save_period: int = -1,
        compute_dtype=jnp.float32,
        nbs: int = 64,
        resume: bool = False,
        tensorboard: bool = False,
        close_mosaic: int = 10,
    ):
        self.yolo = yolo
        self.model = yolo.model
        self.data = data
        self.epochs = epochs
        self.batch = batch
        self.imgsz = imgsz
        self.max_gt = max_gt
        self.patience = patience
        self.save_dir = Path(save_dir)
        self.mesh = mesh
        self.do_val = val
        self.seed = seed
        self.hyp = hyp or {}
        self.save_period = save_period
        self.close_mosaic = close_mosaic

        self.train_set = YOLODataset(data, split="train", imgsz=imgsz, max_gt=max_gt, augment=True, hyp=self.hyp)
        self.loader = DataLoader(self.train_set, batch, shuffle=True, seed=seed)
        nb = max(len(self.loader), 1)
        warmup_steps = max(round(warmup_epochs * nb), 100) if warmup_epochs > 0 else 0
        total_steps = self.epochs * nb

        def lr_schedule(step):
            # linear warmup then per-epoch linear decay to lr0*lrf
            # (reference trainer.py warmup + _setup_scheduler lf lambda)
            warm = lr0 * jnp.minimum(step / jnp.maximum(warmup_steps, 1), 1.0)
            epoch_f = step / nb
            frac = jnp.clip(epoch_f / max(self.epochs, 1), 0.0, 1.0)
            decay = lr0 * ((1.0 - frac) * (1.0 - lrf) + lrf)
            return jnp.where(step < warmup_steps, warm, decay)

        self.lr_schedule = lr_schedule
        params_template = yolo.params
        self.tx = make_optimizer(lr_schedule, momentum=momentum, weight_decay=weight_decay, params=params_template)
        self.state = TrainState(
            params=yolo.params,
            opt_state=self.tx.init(yolo.params),
            ema_params=jax.tree_util.tree_map(jnp.copy, yolo.params),
            step=jnp.zeros((), jnp.int32),
            ema_updates=jnp.zeros((), jnp.float32),
        )
        # grad accumulation toward the nominal batch size (reference nbs=64,
        # trainer.py accumulate = max(round(nbs/batch), 1)); here micro-batching
        # splits the loaded batch, so effective batch == loaded batch
        accumulate = 1
        self.step_fn = make_train_step(
            self.model, tx=self.tx, mesh=mesh, imgsz=imgsz, batch_per_step=batch, max_gt=max_gt,
            hyp=self.hyp, compute_dtype=compute_dtype, accumulate=accumulate,
        )
        from ..utils.callbacks import default_callbacks
        from .recovery import TrainingRecoveryController

        self.callbacks = default_callbacks(str(self.save_dir), tensorboard=tensorboard)
        self.recovery = TrainingRecoveryController(self.model, str(self.save_dir), smoke_imgsz=min(imgsz, 64))
        self.start_epoch = 0
        if resume:
            ckpt = self.save_dir / "state"
            if ckpt.exists():
                from ..utils.checkpoint import load_train_state

                self.state = load_train_state(str(ckpt), self.state)
                self.start_epoch = int(self.state.step) // max(len(self.loader), 1)
                LOGGER.info(f"resumed from {ckpt} at epoch {self.start_epoch}")
        self.validator = (
            DetectionValidator(model=self.model, data=data, imgsz=imgsz, batch=min(batch, 8), max_gt=max_gt, mesh=mesh)
            if val
            else None
        )

    def train(self) -> Dict[str, float]:
        self.save_dir.mkdir(parents=True, exist_ok=True)
        best_fitness, best_epoch = -1.0, -1
        metrics_out: Dict[str, float] = {}
        nb = len(self.loader)
        LOGGER.info(f"training {self.epochs} epochs x {nb} steps, batch {self.batch}, imgsz {self.imgsz}")
        for epoch in range(self.start_epoch, self.epochs):
            if self.close_mosaic and epoch >= self.epochs - self.close_mosaic and self.train_set.mosaic_enabled:
                self.train_set.mosaic_enabled = False  # reference close_mosaic
                LOGGER.info("closing mosaic augmentation for final epochs")
            t0 = time.perf_counter()
            agg = {}
            for batch in self.loader.epoch(epoch):
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
                self.state, m = self.step_fn(self.state, batch)
                for k, v in m.items():
                    agg[k] = agg.get(k, 0.0) + float(v)
            agg = {k: v / max(nb, 1) for k, v in agg.items()}
            lr_now = float(self.lr_schedule(self.state.step))
            LOGGER.info(
                f"epoch {epoch + 1}/{self.epochs}  loss {agg.get('loss', 0):.4f} "
                f"(box {agg.get('box_loss', 0):.3f} cls {agg.get('cls_loss', 0):.3f} "
                f"dfl {agg.get('dfl_loss', 0):.3f} aux {agg.get('aux_loss', 0):.3f}) "
                f"lr {lr_now:.5f}  {time.perf_counter() - t0:.1f}s"
            )
            # coordinated NaN recovery (reference recovery.py / trainer.py:1392)
            self.state, recovered = self.recovery.maybe_recover(self.state, agg)
            if not recovered:
                self.recovery.refresh(self.state, epoch, agg)
            self.callbacks.fire("on_fit_epoch_end", epoch, agg)
            if self.validator is not None:
                metrics_out = self.validator(params=self.state.ema_params)
                fit = metrics_out.get("fitness", 0.0)
                if fit > best_fitness:
                    best_fitness, best_epoch = fit, epoch
                    save_params_npz(self.state.ema_params, self.save_dir / "best.npz")
                if epoch - best_epoch >= self.patience:
                    LOGGER.info(f"early stop at epoch {epoch + 1} (no fitness gain for {self.patience} epochs)")
                    break
            if self.save_period > 0 and (epoch + 1) % self.save_period == 0:
                save_train_state(self.state, self.save_dir / "state")
        save_params_npz(self.state.ema_params, self.save_dir / "last.npz")
        self.yolo.params = self.state.ema_params
        metrics_out["best_fitness"] = best_fitness
        return metrics_out
