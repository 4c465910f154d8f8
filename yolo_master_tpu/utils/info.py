"""Model info + profiling utilities (reference: ultralytics/utils/
torch_utils.py:391 model_info / get_flops via thop, :519 profile; plus the
per-stage Profile timers in predictor/validator).

TPU-native: FLOPs/bytes come from the COMPILED HLO (cost_analysis) — exact
for the graph that actually runs, no operator-table estimation — and traces
come from jax.profiler.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from . import LOGGER


def model_info(model, params, imgsz: int = 640, verbose: bool = True) -> Dict[str, float]:
    """Parameters + compiled-graph GFLOPs/MB at the given input size
    (reference model.info())."""
    from ..nn.module import Context

    n_params = model.num_params(params)
    f = jax.jit(lambda p, x: model.forward_train(p, x, Context(training=False)))
    x = jax.ShapeDtypeStruct((1, imgsz, imgsz, 3), jnp.float32)
    c = f.lower(params, x).compile().cost_analysis()
    flops = float(c.get("flops", 0.0))
    out = {
        "params": n_params,
        "gflops": round(flops / 1e9, 2),
        "bytes_accessed_mb": round(float(c.get("bytes accessed", 0.0)) / 1e6, 1),
        "imgsz": imgsz,
    }
    if verbose:
        LOGGER.info(
            f"model: {n_params:,} params, {out['gflops']} GFLOPs @ {imgsz} "
            f"({out['bytes_accessed_mb']} MB HLO traffic)"
        )
    return out


class Profile(contextlib.ContextDecorator):
    """Accumulating wall-clock timer (reference utils/ops.py:18 Profile)."""

    def __init__(self):
        self.t = 0.0
        self.n = 0

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.dt = time.perf_counter() - self._start
        self.t += self.dt
        self.n += 1
        return False

    @property
    def avg_ms(self) -> float:
        return self.t / max(self.n, 1) * 1e3


@contextlib.contextmanager
def trace(log_dir: str = "runs/profile"):
    """jax.profiler trace context — the TPU analog of torch.profiler; view
    with TensorBoard or xprof (reference ProfileModels)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        LOGGER.info(f"profiler trace written to {log_dir}")
