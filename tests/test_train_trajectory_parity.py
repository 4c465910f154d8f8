"""K-step training-TRAJECTORY parity vs the reference trainer (VERDICT r3 item 4).

Same imported weights, same batches, same hyperparameters: run 5 optimizer
steps through the reference hot loop — the 3/4-group SGD policy with router
lr-scaling (trainer.py:1484-1528), per-iteration warmup interp of lr/bias-lr/
momentum (trainer.py:630-647), global-norm clip 10.0 + ModelEMA ramped decay
(trainer.py:959, utils/torch_utils.py:695) — and through our
build_optimizer + make_train_step, then gate the max weight delta, EMA delta,
and per-step losses. This is the layer the single-loss-value gate
(test_parity_torch.py::test_detection_loss_parity) cannot see: optimizer
grouping, warmup schedules, clipping, coupled weight decay, BN running-stat
updates, and EMA all have to agree for the trajectories to stay together.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

K = 5          # optimizer steps (all inside warmup: the interp region)
NW = 8         # warmup iterations
B, M, SZ = 2, 4, 64
LR0, MOM, WMOM, WBL, WD = 0.01, 0.937, 0.8, 0.1, 5e-4
ROUTER_SCALE = 0.5  # reference moe_router_lr_scale default

CFG_PLAIN = {
    "nc": 4,
    "backbone": [
        [-1, 1, "Conv", [8, 3, 2]],
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [16, 3, 1]],
    ],
    "head": [[[2], 1, "Detect", ["nc"]]],
}
CFG_MOE = {
    "nc": 4,
    "backbone": [
        [-1, 1, "Conv", [8, 3, 2]],
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "ES_MOE", [16, 16, 4]],
    ],
    "head": [[[2], 1, "Detect", ["nc"]]],
}


def _batches(nc, steps=K, seed=0):
    """Shared synthetic batches in our padded layout (xyxy px + mask)."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(steps):
        boxes = np.zeros((B, M, 4), np.float32)
        cls = np.zeros((B, M), np.int32)
        mask = np.zeros((B, M), bool)
        for b in range(B):
            n = int(rng.integers(1, M + 1))
            xy = rng.uniform(4, SZ - 20, (n, 2))
            wh = rng.uniform(8, 18, (n, 2))
            boxes[b, :n, :2] = xy
            boxes[b, :n, 2:] = np.minimum(xy + wh, SZ - 1)
            cls[b, :n] = rng.integers(0, nc, n)
            mask[b, :n] = True
        out.append({
            "images": rng.random((B, SZ, SZ, 3), np.float32).astype(np.float32),
            "boxes": boxes, "classes": cls, "mask": mask,
        })
    return out


def _to_torch_targets(torch, batch):
    """Our padded layout -> reference (batch_idx, cls, normalized xywh)."""
    bi, cl, xywh = [], [], []
    for b in range(B):
        for j in range(M):
            if not batch["mask"][b, j]:
                continue
            x1, y1, x2, y2 = batch["boxes"][b, j]
            bi.append(b)
            cl.append(batch["classes"][b, j])
            xywh.append([(x1 + x2) / 2 / SZ, (y1 + y2) / 2 / SZ, (x2 - x1) / SZ, (y2 - y1) / SZ])
    return {
        "batch_idx": torch.tensor(bi, dtype=torch.float32),
        "cls": torch.tensor(cl, dtype=torch.float32),
        "bboxes": torch.tensor(xywh, dtype=torch.float32),
    }


def _torch_trajectory(cfg, batches):
    """Reference-side K steps: exact hot-loop semantics on torch CPU."""
    import copy

    import torch
    from ultralytics.cfg import get_cfg
    from ultralytics.nn.tasks import DetectionModel as TorchModel
    from ultralytics.utils.loss import v8DetectionLoss
    from ultralytics.utils.torch_utils import ModelEMA

    torch.manual_seed(0)
    tm = TorchModel(copy.deepcopy(cfg), verbose=False)
    tm.args = get_cfg()
    init_sd = copy.deepcopy(tm.state_dict())
    tm.train()
    crit = v8DetectionLoss(tm)

    # build_optimizer policy (trainer.py:1484-1528): router check precedes
    # bias; BN weights + logit_scale un-decayed; conv/linear weights decayed.
    bn_types = tuple(v for k, v in torch.nn.__dict__.items() if "Norm" in k and isinstance(v, type))
    groups = {"bias": [], "weight": [], "bn": [], "router": []}
    for mn, mod in tm.named_modules():
        for pn, prm in mod.named_parameters(recurse=False):
            full = f"{mn}.{pn}" if mn else pn
            if "routing" in full.lower() or "router" in full.lower():
                groups["router"].append(prm)
            elif "bias" in full:
                groups["bias"].append(prm)
            elif isinstance(mod, bn_types):
                groups["bn"].append(prm)
            else:
                groups["weight"].append(prm)
    opt = torch.optim.SGD(
        [
            {"params": groups["bias"], "lr": LR0, "weight_decay": 0.0, "param_group": "bias"},
            {"params": groups["weight"], "lr": LR0, "weight_decay": WD, "param_group": "weight"},
            {"params": groups["bn"], "lr": LR0, "weight_decay": 0.0, "param_group": "bn"},
            {"params": groups["router"], "lr": LR0 * ROUTER_SCALE, "weight_decay": WD, "param_group": "router"},
        ],
        lr=LR0, momentum=MOM, nesterov=True,
    )
    for pg in opt.param_groups:
        pg["initial_lr"] = pg["lr"]
    ema = ModelEMA(tm)

    losses = []
    for ni, batch in enumerate(batches):
        # warmup interp (trainer.py:630-647); lf(epoch=0) == 1.0
        for x in opt.param_groups:
            x["lr"] = float(np.interp(ni, [0, NW], [WBL if x["param_group"] == "bias" else 0.0, x["initial_lr"]]))
            x["momentum"] = float(np.interp(ni, [0, NW], [WMOM, MOM]))
        img = torch.from_numpy(batch["images"].transpose(0, 3, 1, 2))
        preds = tm(img)
        loss, _ = crit(preds, _to_torch_targets(torch, batch))
        total = loss.sum()
        opt.zero_grad()
        total.backward()
        torch.nn.utils.clip_grad_norm_(tm.parameters(), max_norm=10.0)
        opt.step()
        ema.update(tm)
        losses.append(float(total))
    return init_sd, tm.state_dict(), ema.ema.state_dict(), losses


def _jax_trajectory(cfg, batches, init_sd):
    import jax
    import jax.numpy as jnp

    from yolo_master_tpu.engine.train_step import TrainState, build_optimizer, make_train_step
    from yolo_master_tpu.nn.tasks import DetectionModel as JaxModel
    from yolo_master_tpu.utils.torch_import import import_state_dict

    model = JaxModel(cfg)
    params = import_state_dict(model.init_params(0), init_sd, strict=True)

    def lr_fn(s):
        return LR0 * jnp.minimum(s / NW, 1.0)

    def bias_fn(s):
        t = jnp.clip(s / NW, 0.0, 1.0)
        return WBL + t * (LR0 - WBL)

    def mom_fn(s):
        t = jnp.clip(s / NW, 0.0, 1.0)
        return WMOM + t * (MOM - WMOM)

    tx = build_optimizer("sgd", lr_fn, params, momentum=MOM, weight_decay=WD,
                         momentum_fn=mom_fn, bias_lr_fn=bias_fn, router_lr_scale=ROUTER_SCALE)
    state = TrainState(
        params=params, opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        step=jnp.zeros((), jnp.int32), ema_updates=jnp.zeros((), jnp.float32), aux_ema=None,
    )
    step = make_train_step(model, tx=tx, imgsz=SZ, batch_per_step=B, max_gt=M,
                           hyp={"moe": 0.0})
    losses = []
    for batch in batches:
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        state, metrics = step(state, jb)
        losses.append(float(metrics["loss"]))
    return model, state, losses


def _max_delta(a_tree, b_tree):
    import jax

    deltas = [
        float(np.abs(np.asarray(x, np.float32) - np.asarray(y, np.float32)).max())
        for x, y in zip(jax.tree_util.tree_leaves(a_tree), jax.tree_util.tree_leaves(b_tree))
    ]
    return max(deltas)


@pytest.mark.parametrize("cfg", [CFG_PLAIN, CFG_MOE], ids=["plain", "es_moe"])
def test_k_step_trajectory_parity(torch_reference, cfg):
    from yolo_master_tpu.utils.torch_import import import_state_dict

    batches = _batches(cfg["nc"])
    init_sd, final_sd, ema_sd, t_losses = _torch_trajectory(cfg, batches)
    model, state, j_losses = _jax_trajectory(cfg, batches, init_sd)

    # per-step loss trajectory (forward parity on the *evolving* weights)
    np.testing.assert_allclose(j_losses, t_losses, rtol=2e-3, err_msg=f"{j_losses} vs {t_losses}")

    # final weights after K optimizer steps (weights move O(lr*K) ~ 5e-3;
    # gate at 1e-4 = <2% of the movement)
    ref_final = import_state_dict(model.init_params(1), final_sd, strict=True)
    dw = _max_delta(state.params, ref_final)
    assert dw < 1e-4, f"weight trajectory diverged: max|dW|={dw}"

    # EMA trajectory (ramped decay + update counter semantics)
    ref_ema = import_state_dict(model.init_params(2), ema_sd, strict=True)
    de = _max_delta(state.ema_params, ref_ema)
    assert de < 1e-4, f"EMA trajectory diverged: max|dEMA|={de}"
