"""Declarative, resumable benchmark suites (reference: benchmarks/suite.py +
suites.yaml + mixture_baselines.yaml parity gates).

A suite is a list of named configs; results persist to JSON after every entry
so interrupted runs resume where they stopped. Built-in kinds:
  * latency:   chained-iteration device latency of forward+decode+NMS
  * sparse_parity: sparse-vs-dense routing output gap for a routed model
    (the reference gate: max abs diff <= 1e-4, mixture_baselines.yaml:4)
  * expert_flops: dense-vs-topk expert FLOP ratio for ES_MOE blocks
    (gate: >= 20% reduction, mixture_baselines.yaml:5)
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from ..nn.module import Context
from ..utils import LOGGER, yaml_load

DEFAULT_SUITE = [
    {"name": "master-n-latency", "kind": "latency", "model": "yolo-master-n", "imgsz": 640},
    {"name": "master-n-sparse-parity", "kind": "sparse_parity", "model": "yolo-master-n", "imgsz": 64},
    {"name": "moe16-expert-flops", "kind": "expert_flops", "num_experts": 16, "top_k": 2},
]


def _latency(entry) -> dict:
    from ..nn.tasks import DetectionModel
    from ..ops.nms import non_max_suppression

    model = DetectionModel(entry["model"])
    params = jax.device_put(jax.tree_util.tree_map(lambda w: w.astype(jnp.bfloat16), model.init_params(0)))
    imgsz = entry.get("imgsz", 640)

    def make(reps):
        @jax.jit
        def run(p, x0):
            def body(i, carry):
                x, acc = carry
                d = model.forward_predict(p, x, Context(training=False))
                det = non_max_suppression(d, nc=model.nc, conf_thres=0.25, iou_thres=0.45, max_det=300, max_nms=2048)
                s = det["scores"].sum()
                return x0 + (s * 1e-9).astype(jnp.bfloat16), acc + s

            return jax.lax.fori_loop(0, reps, body, (x0, jnp.zeros((), jnp.float32)))[1]

        return run

    x0 = jnp.full((1, imgsz, imgsz, 3), 0.5, jnp.bfloat16)

    def timed(run):
        float(run(params, x0))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(run(params, x0))
            ts.append((time.perf_counter() - t0) * 1e3)
        ts.sort()
        return ts[len(ts) // 2]

    t1, t21 = timed(make(1)), timed(make(21))
    return {"latency_ms": round((t21 - t1) / 20, 4)}


def _sparse_parity(entry) -> dict:
    """Gathered-sparse vs masked-dense routing output gap (reference gate:
    max abs diff <= 1e-4, mixture_baselines.yaml:4). Runs under
    default_matmul_precision('highest') so the gate measures *algorithmic*
    equivalence of the two dispatch paths, not backend conv rounding (JAX's
    default conv precision is reduced on both CPU and TPU)."""
    import numpy as np

    from ..nn.tasks import DetectionModel

    model = DetectionModel(entry["model"])
    params = model.init_params(0)
    imgsz = entry.get("imgsz", 64)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, imgsz, imgsz, 3)), jnp.float32)
    with jax.default_matmul_precision("highest"):
        y_sparse = model.forward_predict(params, x, Context(training=False, sparse_inference=True))
        y_dense = model.forward_predict(params, x, Context(training=False, sparse_inference=False))
    gap = float(jnp.abs(y_sparse - y_dense).max())
    return {"max_abs_diff": gap, "pass": gap <= entry.get("gate", 1e-4)}


def _expert_flops(entry) -> dict:
    """MEASURED expert-compute reduction from gathered top-k dispatch
    (gate >= 20%, reference benchmarks/mixture_baselines.yaml:5).

    Compiles the sparse (gathered, nn/moe/dispatch.py) and dense
    (compute-all-experts) eval forwards of a routed block and compares
    (a) compiled-HLO FLOPs via cost_analysis and (b) wall-clock latency.
    Default block: the v0_1-style 16-expert ModularRouterExpertMoE layer."""
    import time as _t

    import numpy as np

    from ..nn.module import Context as Ctx
    from ..nn.moe.mixtures import ModularRouterExpertMoE

    c = entry.get("channels", 64)
    m = ModularRouterExpertMoE(
        c, c,
        num_experts=entry.get("num_experts", 16),
        top_k=entry.get("top_k", 2),
        progressive_sparsity=False,
    )
    m.finalize("bench")
    params = m.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(entry.get("batch", 4), 32, 32, c)), jnp.float32)

    f_sparse = jax.jit(lambda p, x: m(p, x, Ctx(training=False, sparse_inference=True)))
    f_dense = jax.jit(lambda p, x: m(p, x, Ctx(training=False, sparse_inference=False)))
    flops_s = f_sparse.lower(params, x).compile().cost_analysis().get("flops", 0.0)
    flops_d = f_dense.lower(params, x).compile().cost_analysis().get("flops", 0.0)

    def med_latency(f):
        f(params, x)[0].block_until_ready()
        ts = []
        for _ in range(7):
            t0 = _t.perf_counter()
            f(params, x)[0].block_until_ready()
            ts.append((_t.perf_counter() - t0) * 1e3)
        ts.sort()
        return ts[len(ts) // 2]

    lat_s, lat_d = med_latency(f_sparse), med_latency(f_dense)
    flop_reduction = 1.0 - flops_s / max(flops_d, 1.0)
    return {
        "flops_sparse": flops_s,
        "flops_dense": flops_d,
        "flop_reduction": round(flop_reduction, 4),
        "latency_sparse_ms": round(lat_s, 3),
        "latency_dense_ms": round(lat_d, 3),
        "pass": flop_reduction >= entry.get("gate", 0.2),
    }


KINDS = {"latency": _latency, "sparse_parity": _sparse_parity, "expert_flops": _expert_flops}


class BenchmarkSuite:
    def __init__(self, entries: Optional[List[dict]] = None, save_path: str = "runs/bench/suite.json"):
        self.entries = entries or DEFAULT_SUITE
        self.save_path = Path(save_path)
        self.results: Dict[str, dict] = {}
        if self.save_path.exists():
            self.results = json.loads(self.save_path.read_text())

    def run(self) -> Dict[str, dict]:
        for entry in self.entries:
            name = entry["name"]
            if name in self.results:
                LOGGER.info(f"bench {name}: cached (resume)")
                continue
            LOGGER.info(f"bench {name} ({entry['kind']})...")
            try:
                self.results[name] = KINDS[entry["kind"]](entry)
            except Exception as e:  # noqa: BLE001
                self.results[name] = {"error": str(e)}
            self.save_path.parent.mkdir(parents=True, exist_ok=True)
            self.save_path.write_text(json.dumps(self.results, indent=2))
        return self.results


def run_suite(path: Optional[str] = None, save_path: str = "runs/bench/suite.json"):
    entries = yaml_load(path) if path else None
    return BenchmarkSuite(entries, save_path).run()


class ProfileModels:
    """Profile a list of model configs on the current JAX backend (reference
    parity: ultralytics/utils/benchmarks.py:262 ProfileModels, recast from
    ONNX/TensorRT to compiled-XLA): params, GFLOPs from the compiled HLO,
    compile time and steady-state forward latency per model.

    Examples:
        >>> ProfileModels(["yolo-master-n", "yolo26-master"], imgsz=320).run()
    """

    def __init__(self, paths, imgsz: int = 640, num_timed_runs: int = 20, num_warmup_runs: int = 2):
        self.paths = list(paths)
        self.imgsz = imgsz
        self.num_timed_runs = num_timed_runs
        self.num_warmup_runs = num_warmup_runs

    def run(self) -> List[dict]:
        import time

        import jax
        import jax.numpy as jnp

        from ..models.yolo import YOLO
        from ..utils.hostinfo import select_device_summary
        from ..utils.info import model_info

        rows = []
        LOGGER.info(f"ProfileModels on {select_device_summary()}")
        for path in self.paths:
            model = YOLO(path).model
            params = jax.device_put(model.init_params(0))
            info = model_info(model, params, imgsz=self.imgsz, verbose=False)
            fwd = jax.jit(lambda p, x, m=model: m.forward_predict(p, x))
            x = jnp.zeros((1, self.imgsz, self.imgsz, 3), jnp.float32)
            t0 = time.perf_counter()
            jax.block_until_ready(fwd(params, x))
            compile_s = time.perf_counter() - t0
            for _ in range(self.num_warmup_runs):
                jax.block_until_ready(fwd(params, x))
            times = []
            for _ in range(self.num_timed_runs):
                t0 = time.perf_counter()
                jax.block_until_ready(fwd(params, x))
                times.append((time.perf_counter() - t0) * 1e3)
            times.sort()
            row = {
                "model": str(path),
                "imgsz": self.imgsz,
                "params_m": round(info.get("params", 0) / 1e6, 3),
                "gflops": round(info.get("gflops", 0.0), 2),
                "compile_s": round(compile_s, 2),
                "latency_ms_median": round(times[len(times) // 2], 3),
                "latency_ms_min": round(times[0], 3),
            }
            rows.append(row)
            LOGGER.info(
                f"  {row['model']}: {row['params_m']}M params, {row['gflops']} GFLOPs, "
                f"{row['latency_ms_median']} ms @ {self.imgsz}"
            )
        return rows
