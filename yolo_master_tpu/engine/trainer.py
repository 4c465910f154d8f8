"""Detection trainer (reference: ultralytics/engine/trainer.py:164-1719 BaseTrainer).

Single-program TPU training: no subprocess relaunch, no DDP wrapper — the
jitted train step is sharded over a jax mesh (data axis) and XLA inserts all
collectives (SURVEY.md §2.7 mapping). Reproduced trainer behaviors:

  * optimizer selection: auto|SGD|AdamW|Adam|Muon (auto resolves by run length
    and nc like the reference's build_optimizer, trainer.py:649-666)
  * grad accumulation toward the nominal batch nbs=64 (accumulate loader
    batches into one jitted super-batch step, micro-batched inside the jit)
  * warmup: lr 0->lr0, bias lr warmup_bias_lr->lr, momentum warmup_momentum->
    momentum (reference warmup loop); linear or cosine (cos_lr) decay to lrf
  * amp: bf16 forward/backward by default (the TPU AMP analog; loss in fp32,
    no GradScaler needed)
  * EMA with ramped decay; validation + fitness on EMA weights
  * best/last checkpointing, early stopping (patience on fitness)
  * non-finite loss step-skip + healthy-checkpoint recovery (trainer.py:1392)
  * MoE runtime control (reference engine/extensions/mixture.py:22-90):
    per-epoch routing usage tracking from Context.stats, routing history CSV,
    collapse detection, Gini / mAP-saturation aux-gain schedulers feeding a
    traced moe_gain back into the step without recompiling
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
from ..nn.moe.analysis import ExpertUsageTracker, RoutingCollapseDetector, RoutingHistory
from ..nn.moe.scheduler import GiniBalanceScheduler, MapSaturationScheduler
from ..utils import LOGGER
from ..utils.checkpoint import save_params_npz, save_train_state
from .train_step import (
    TrainState,
    build_optimizer,
    make_train_step,
    resolve_auto_optimizer,
)
from .validator import DetectionValidator


class DetectionTrainer:
    dataset_cls = YOLODataset
    validator_cls = DetectionValidator
    task = "detect"

    def __init__(
        self,
        yolo,
        data: str,
        epochs: int = 100,
        batch: int = 16,
        imgsz: int = 640,
        optimizer: str = "auto",
        lr0: float = 0.01,
        lrf: float = 0.01,
        cos_lr: bool = False,
        momentum: float = 0.937,
        weight_decay: float = 5e-4,
        warmup_epochs: float = 3.0,
        warmup_momentum: float = 0.8,
        warmup_bias_lr: float = 0.1,
        max_gt: int = 128,
        patience: int = 100,
        save_dir: str = "runs/train",
        mesh=None,
        val: bool = True,
        seed: int = 0,
        hyp: Optional[Dict] = None,
        save_period: int = -1,
        amp: bool = True,
        compute_dtype=None,
        nbs: int = 64,
        resume: bool = False,
        tensorboard: bool = False,
        close_mosaic: int = 10,
        moe_schedule: Optional[str] = "gini",
        peft: Optional[Dict] = None,
        workers: int = 4,
        prefetch: int = 3,
        expert_parallel: int = 1,
        cache: Optional[str] = None,
    ):
        self.yolo = yolo
        self.model = yolo.model
        # Adapter lifecycle (reference engine/extensions/adapters.py:68):
        # train on {"base": frozen, "adapters": trainable}, merged in-graph
        self.adapter_controller = None
        start_params = yolo.params
        if peft:
            from ..peft.controller import AdapterController

            self.adapter_controller = AdapterController(**peft)
            if self.adapter_controller.enabled:
                self.model, start_params = self.adapter_controller.attach(self.model, yolo.params)
            else:
                self.adapter_controller = None
        self.data = data
        self.epochs = epochs
        if expert_parallel > 1 and mesh is None:
            # expert parallelism: second mesh axis over which routed blocks
            # shard their [E, ...] banks (make_train_step expert_axis)
            import jax as _jax

            from ..parallel.mesh import make_mesh

            n = len(_jax.devices())
            assert n % expert_parallel == 0, f"{n} devices not divisible by expert_parallel={expert_parallel}"
            mesh = make_mesh(n, axes=("data", "expert"), shape=(n // expert_parallel, expert_parallel))
        self.expert_axis = "expert" if (mesh is not None and "expert" in mesh.axis_names) else None
        if batch == -1:  # reference batch=-1 -> AutoBatch (utils/autobatch.py:15)
            batch = self._autobatch(yolo, imgsz, max_gt, hyp or {}, mesh, compute_dtype, amp)
            LOGGER.info(f"autobatch selected batch={batch}")
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
        compute_dtype = compute_dtype or (jnp.bfloat16 if amp else jnp.float32)

        # multi-process/multi-host (parallel/launch.py): rank-0 gating of
        # checkpoint/log writes + per-process loader shard (reference RANK-0
        # gates, utils/torch_utils.py:64 / trainer.py:881)
        self.n_processes = jax.process_count()
        from ..parallel.launch import is_main_process

        self.is_main = is_main_process()
        proc_shard = (jax.process_index(), self.n_processes) if self.n_processes > 1 else None
        if self.n_processes > 1:
            assert mesh is not None, "multi-process training requires a global mesh (parallel.launch.global_mesh)"

        self.cache = cache
        self.train_set = self._build_dataset(data, "train")
        if workers and workers > 0:
            # threaded prefetching input pipeline (reference InfiniteDataLoader
            # + workers, data/build.py:43-126): decode/augment off the step
            # thread, stage `prefetch` batches, overlap device_put with compute
            from ..data.dataset import PrefetchLoader

            self.loader = PrefetchLoader(
                self.train_set, batch, shuffle=True, seed=seed,
                workers=workers, prefetch=prefetch, process_shard=proc_shard,
            )
        else:
            self.loader = DataLoader(self.train_set, batch, shuffle=True, seed=seed, process_shard=proc_shard)
        nb = max(len(self.loader), 1)
        # grad accumulation toward the nominal batch (reference nbs=64,
        # accumulate = max(round(nbs/batch), 1)): group `accumulate` loader
        # batches into one super-batch step, micro-batched inside the jit
        self.accumulate = max(1, min(round(nbs / batch), nb))
        if self.accumulate == 1 and mesh is not None and self.n_processes == 1 and hasattr(self.loader, "sharding"):
            # producer-side device_put: overlap host->device transfer with the
            # running step (skipped under accumulation, where super-batches are
            # concatenated on host first)
            from ..parallel.mesh import shard_batch

            self.loader.sharding = shard_batch(mesh)
        nb_opt = max(nb // self.accumulate, 1)  # optimizer steps per epoch
        self.nb_opt = nb_opt
        warmup_steps = max(round(warmup_epochs * nb_opt), 100) if warmup_epochs > 0 else 0

        def decay_frac(step):
            frac = jnp.clip(step / max(nb_opt * max(self.epochs, 1), 1), 0.0, 1.0)
            if cos_lr:  # reference one_cycle lf
                return lrf + (1.0 - lrf) * (1.0 + jnp.cos(jnp.pi * frac)) / 2.0
            return (1.0 - frac) * (1.0 - lrf) + lrf

        # optimizer: auto resolution by run length (reference build_optimizer)
        opt_name, opt_lr0, opt_momentum = (
            resolve_auto_optimizer(self.model.nc, self.epochs * nb_opt, lr0, momentum)
            if optimizer == "auto"
            else (optimizer, lr0, momentum)
        )
        if optimizer == "auto":
            LOGGER.info(f"optimizer 'auto' -> {opt_name}(lr={opt_lr0}, momentum={opt_momentum})")

        def lr_schedule(step):
            warm = opt_lr0 * jnp.minimum(step / jnp.maximum(warmup_steps, 1), 1.0)
            return jnp.where(step < warmup_steps, warm, opt_lr0 * decay_frac(step))

        def bias_lr_schedule(step):
            t = jnp.clip(step / jnp.maximum(warmup_steps, 1), 0.0, 1.0)
            warm = warmup_bias_lr + t * (opt_lr0 - warmup_bias_lr)
            return jnp.where(step < warmup_steps, warm, opt_lr0 * decay_frac(step))

        def momentum_schedule(step):
            t = jnp.clip(step / jnp.maximum(warmup_steps, 1), 0.0, 1.0)
            return warmup_momentum + t * (opt_momentum - warmup_momentum)

        self.lr_schedule = lr_schedule
        params_template = start_params
        self.tx = build_optimizer(
            opt_name,
            lr_schedule,
            params_template,
            momentum=opt_momentum,
            weight_decay=weight_decay * batch * self.accumulate / nbs,  # reference wd scaling
            momentum_fn=momentum_schedule if (warmup_steps and opt_name.lower() == "sgd") else None,
            bias_lr_fn=bias_lr_schedule if warmup_steps else None,
            router_lr_scale=float(self.hyp.get("moe_router_lr_scale", 0.5)),
        )
        if self.adapter_controller is not None:
            self.tx = self.adapter_controller.wrap_optimizer(self.tx)
        from ..nn.mixture_loss import init_aux_ema

        self.state = TrainState(
            params=start_params,
            opt_state=self.tx.init(start_params),
            ema_params=jax.tree_util.tree_map(jnp.copy, start_params),
            step=jnp.zeros((), jnp.int32),
            ema_updates=jnp.zeros((), jnp.float32),
            aux_ema=init_aux_ema(),
        )
        self.step_fn = make_train_step(
            self.model, tx=self.tx, mesh=mesh, imgsz=imgsz, batch_per_step=batch * self.accumulate,
            max_gt=max_gt, hyp=self.hyp, compute_dtype=compute_dtype, accumulate=self.accumulate,
            return_stats=True, traced_moe_gain=True, expert_axis=self.expert_axis,
        )
        from ..utils.callbacks import default_callbacks
        from .recovery import TrainingRecoveryController

        self.callbacks = default_callbacks(str(self.save_dir), tensorboard=tensorboard)
        self.recovery = TrainingRecoveryController(self.model, str(self.save_dir), smoke_imgsz=min(imgsz, 64))
        # MoE runtime control (reference MixtureRuntimeController)
        self.moe_gain = float(self.hyp.get("moe", 0.01))
        self.usage_tracker = ExpertUsageTracker()
        self.collapse_detector = RoutingCollapseDetector()
        self.routing_history = RoutingHistory(str(self.save_dir))
        self.gini_sched = GiniBalanceScheduler(self.moe_gain) if moe_schedule == "gini" else None
        self.map_sched = MapSaturationScheduler(self.moe_gain) if moe_schedule == "map" else None
        self.start_epoch = 0
        if resume:
            ckpt = self.save_dir / "state"
            if ckpt.exists():
                import json

                from ..utils.checkpoint import load_train_state

                self.state = load_train_state(str(ckpt), self.state)
                meta_f = self.save_dir / "state_meta.json"
                if meta_f.exists():
                    # explicit epoch record (robust to a loader-length change
                    # between runs — step//nb_opt would silently misalign)
                    self.start_epoch = int(json.loads(meta_f.read_text())["epoch"])
                else:
                    self.start_epoch = int(self.state.step) // max(nb_opt, 1)
                LOGGER.info(f"resumed from {ckpt} at epoch {self.start_epoch}")
        self.validator = self._build_validator() if val else None

    @staticmethod
    def _autobatch(yolo, imgsz, max_gt, hyp, mesh, compute_dtype, amp) -> int:
        """Pick the largest power-of-two batch whose compiled TRAIN step fits
        in 80% of HBM — a dry memory_analysis() binary search, no trial OOMs
        (reference autobatch.py:15 runs real forwards and fits a line)."""
        import optax

        from ..utils.autobatch import autobatch

        cdt = compute_dtype or (jnp.bfloat16 if amp else jnp.float32)
        tx = optax.sgd(0.01)
        opt_state = tx.init(yolo.params)

        def build_step(b):
            return make_train_step(yolo.model, tx=tx, mesh=mesh, imgsz=imgsz, batch_per_step=b,
                                   max_gt=max_gt, hyp=hyp, compute_dtype=cdt)

        def example_args(b):
            from ..nn.mixture_loss import init_aux_ema

            state = TrainState(params=yolo.params, opt_state=opt_state,
                               ema_params=yolo.params, step=jnp.zeros((), jnp.int32),
                               ema_updates=jnp.zeros((), jnp.float32), aux_ema=init_aux_ema())
            batch = {
                "images": jax.ShapeDtypeStruct((b, imgsz, imgsz, 3), jnp.float32),
                "boxes": jax.ShapeDtypeStruct((b, max_gt, 4), jnp.float32),
                "classes": jax.ShapeDtypeStruct((b, max_gt), jnp.int32),
                "mask": jax.ShapeDtypeStruct((b, max_gt), jnp.bool_),
            }
            return (state, batch)

        return autobatch(build_step, example_args)

    def _build_dataset(self, data, split: str):
        return self.dataset_cls(
            data, split=split, imgsz=self.imgsz, max_gt=self.max_gt, augment=split == "train", hyp=self.hyp,
            cache=getattr(self, "cache", None),
        )

    def _build_validator(self):
        return self.validator_cls(
            model=self.model, data=self.data, imgsz=self.imgsz, batch=min(self.batch, 8), max_gt=self.max_gt, mesh=self.mesh
        )

    def _super_batches(self, epoch: int):
        """Group `accumulate` loader batches into one fixed-shape super-batch
        per optimizer step (partial tail groups are dropped to keep shapes
        static — the jit recompile would cost more than the leftover data)."""
        buf = []
        for b in self.loader.epoch(epoch):
            buf.append(b)
            if len(buf) == self.accumulate:
                if self.accumulate == 1:
                    yield buf[0]
                else:
                    yield {k: np.concatenate([x[k] for x in buf], 0) for k in buf[0]}
                buf = []

    def train(self) -> Dict[str, float]:
        self.save_dir.mkdir(parents=True, exist_ok=True)
        best_fitness, best_epoch = -1.0, -1
        metrics_out: Dict[str, float] = {}
        nb_opt = self.nb_opt
        LOGGER.info(
            f"training {self.epochs} epochs x {nb_opt} steps, batch {self.batch}"
            f"{f' x{self.accumulate} accumulated' if self.accumulate > 1 else ''}, imgsz {self.imgsz}"
        )
        for epoch in range(self.start_epoch, self.epochs):
            if self.close_mosaic and epoch >= self.epochs - self.close_mosaic and getattr(self.train_set, "mosaic_enabled", False):
                self.train_set.mosaic_enabled = False  # reference close_mosaic
                LOGGER.info("closing mosaic augmentation for final epochs")
            t0 = time.perf_counter()
            agg = {}
            self.usage_tracker.reset()
            gain = jnp.asarray(self.moe_gain, jnp.float32)
            for batch in self._super_batches(epoch):
                if self.n_processes > 1:
                    # assemble per-process shards into one global mesh array
                    from ..parallel.launch import global_batch

                    batch = global_batch(self.mesh, batch)
                else:
                    batch = {k: jnp.asarray(v) for k, v in batch.items()}
                self.state, m = self.step_fn(self.state, batch, gain)
                stats = m.pop("moe_stats", None)
                if stats:
                    self.usage_tracker.update(jax.tree_util.tree_map(np.asarray, stats))
                for k, v in m.items():
                    agg[k] = agg.get(k, 0.0) + float(v)
            agg = {k: v / max(nb_opt, 1) for k, v in agg.items()}
            lr_now = float(self.lr_schedule(self.state.step))
            LOGGER.info(
                f"epoch {epoch + 1}/{self.epochs}  loss {agg.get('loss', 0):.4f} "
                f"(box {agg.get('box_loss', 0):.3f} cls {agg.get('cls_loss', 0):.3f} "
                f"dfl {agg.get('dfl_loss', 0):.3f} aux {agg.get('aux_loss', 0):.3f}) "
                f"lr {lr_now:.5f}  moe_gain {self.moe_gain:.4f}  {time.perf_counter() - t0:.1f}s"
            )
            # MoE runtime control: history, collapse alarm, gain schedule
            usage = self.usage_tracker.mean_usage()
            if usage:
                self.routing_history.record(epoch, usage)
                for alarm in self.collapse_detector.check(usage):
                    LOGGER.warning(f"routing collapse: {alarm}")
                if self.gini_sched is not None:
                    self.moe_gain = self.gini_sched.update(usage)
            # coordinated NaN recovery (reference recovery.py / trainer.py:1392)
            self.state, recovered = self.recovery.maybe_recover(self.state, agg)
            if not recovered:
                self.recovery.refresh(self.state, epoch, agg)
            self.callbacks.fire("on_fit_epoch_end", epoch, agg)
            if self.validator is not None:
                metrics_out = self.validator(params=self.state.ema_params)
                fit = metrics_out.get("fitness", 0.0)
                if self.map_sched is not None:
                    self.moe_gain = self.map_sched.update(metrics_out.get("mAP50-95", 0.0))
                if fit > best_fitness:
                    best_fitness, best_epoch = fit, epoch
                    if self.is_main:
                        save_params_npz(self.state.ema_params, self.save_dir / "best.npz")
                if epoch - best_epoch >= self.patience:
                    LOGGER.info(f"early stop at epoch {epoch + 1} (no fitness gain for {self.patience} epochs)")
                    break
            if self.save_period > 0 and (epoch + 1) % self.save_period == 0 and self.is_main:
                import json

                save_train_state(self.state, self.save_dir / "state")
                (self.save_dir / "state_meta.json").write_text(
                    json.dumps({"epoch": epoch + 1, "nb_opt": nb_opt, "step": int(self.state.step)})
                )
        if self.is_main:
            self.routing_history.save()
        if self.is_main and self.routing_history.rows:
            from ..nn.moe.analysis import render_dashboard

            render_dashboard(self.routing_history)  # routing_dashboard.html (reference moe/viz.py)
        self.callbacks.fire("on_train_end")
        if self.is_main:
            save_params_npz(self.state.ema_params, self.save_dir / "last.npz")
        if self.adapter_controller is not None:
            # fold adapters into plain deployable weights; adapters.npz saved
            # separately (reference strip/publish flow, lora/io.py)
            self.yolo.params = self.adapter_controller.fold(self.state.ema_params, str(self.save_dir))
        else:
            self.yolo.params = self.state.ema_params
        metrics_out["best_fitness"] = best_fitness
        return metrics_out


class MultiTrainer:
    """Fine-tune one base model across a collection of datasets in series
    (reference: engine/trainer.py:1564 MultiTrainer, triggered by
    ``Model.train(data=[...])`` at engine/model.py:872).

    Every run is seeded from the SAME base weights (functional pytrees make
    this trivial — we just hold a reference to the immutable base params), runs
    are nested under one sweep directory, and per-dataset + mean metrics are
    written to ``multitrain_results.json`` beside a ``multitrain_results.png``
    fitness bar chart. The facade's params are restored to the base afterwards;
    each dataset's fine-tuned weights live in its own run subdirectory.
    """

    def __init__(self, yolo, datasets, trainer_cls=None, save_dir: str = "runs/multitrain", **kwargs):
        from .trainers_task import TASK_TRAINERS

        self.yolo = yolo
        self.datasets = list(datasets)
        self.trainer_cls = trainer_cls or TASK_TRAINERS[yolo.task]
        self.save_dir = Path(save_dir)
        self.kwargs = kwargs
        self.metrics: Dict[str, Dict[str, float]] = {}

    def train(self) -> Dict[str, Dict[str, float]]:
        self.save_dir.mkdir(parents=True, exist_ok=True)
        # Identical seed for every run. The jitted train step DONATES the param
        # buffers, so each run gets its own device copy of the base snapshot.
        base_params = jax.tree_util.tree_map(jnp.copy, self.yolo.params)
        names: list = []
        for i, data in enumerate(self.datasets):
            stem = Path(str(data)).stem or f"dataset{i}"
            name = stem
            k = 2
            while name in names:  # reference dedupes repeat datasets as name-2, name-3, ...
                name, k = f"{stem}-{k}", k + 1
            names.append(name)
            LOGGER.info(f"MultiTrainer {i + 1}/{len(self.datasets)}: fine-tuning on {data}")
            self.yolo.params = jax.tree_util.tree_map(jnp.copy, base_params)
            try:
                trainer = self.trainer_cls(self.yolo, data=data, save_dir=str(self.save_dir / name), **self.kwargs)
                out = trainer.train()
                self.metrics[name] = {k_: float(v) for k_, v in out.items() if isinstance(v, (int, float))}
            except Exception as e:  # noqa: BLE001 — one bad dataset must not sink the sweep
                LOGGER.warning(f"MultiTrainer: run '{name}' failed: {e}")
                self.metrics[name] = {"error": 1.0}
        self.yolo.params = base_params  # base model object left unchanged
        ok = {n: m for n, m in self.metrics.items() if "error" not in m}
        keys = sorted({k for m in ok.values() for k in m}) if ok else []
        mean = {k: float(np.mean([m[k] for m in ok.values() if k in m])) for k in keys}
        payload = {"runs": self.metrics, "mean": mean}
        import json

        (self.save_dir / "multitrain_results.json").write_text(json.dumps(payload, indent=2))
        self._plot(ok)
        return self.metrics

    def _plot(self, ok: Dict[str, Dict[str, float]]) -> None:
        """multitrain_results.png — per-dataset fitness bar chart (best-effort)."""
        if not ok:
            return
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            names = list(ok)
            fits = [ok[n].get("best_fitness", ok[n].get("fitness", 0.0)) for n in names]
            fig, ax = plt.subplots(figsize=(max(4, 1.2 * len(names)), 4))
            ax.bar(names, fits, color="#4878cf")
            ax.set_ylabel("fitness")
            ax.set_title("MultiTrainer per-dataset fitness")
            for lbl in ax.get_xticklabels():
                lbl.set_rotation(30)
            fig.tight_layout()
            fig.savefig(self.save_dir / "multitrain_results.png", dpi=100)
            plt.close(fig)
        except Exception as e:  # noqa: BLE001
            LOGGER.warning(f"MultiTrainer: plot skipped: {e}")
