"""TPU-native automatic batch sizing (reference: ultralytics/utils/
autobatch.py:15,50 — the torch version runs trial forwards and fits a line to
CUDA memory; on TPU we can do better: XLA reports the compiled step's exact
memory footprint WITHOUT running it, so autobatch is a dry binary search over
``compile().memory_analysis()``).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax

from . import LOGGER

# HBM per chip (bytes); queried from the device when available
_DEFAULT_HBM = 16 * 1024**3


def device_hbm_bytes() -> int:
    try:
        stats = jax.devices()[0].memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"])
    except Exception:  # noqa: BLE001
        pass
    return _DEFAULT_HBM


def compiled_step_bytes(build_step: Callable[[int], Callable], batch: int, example_args_fn) -> int:
    """Lower+compile the step at this batch size and return its peak HBM need
    (args + temp + output) without executing anything."""
    step = build_step(batch)
    args = example_args_fn(batch)
    compiled = jax.jit(step).lower(*args).compile() if not hasattr(step, "lower") else step.lower(*args).compile()
    m = compiled.memory_analysis()
    return int(m.argument_size_in_bytes + m.temp_size_in_bytes + m.output_size_in_bytes)


def autobatch(
    build_step: Callable[[int], Callable],
    example_args_fn: Callable[[int], tuple],
    fraction: float = 0.8,
    max_batch: int = 256,
    hbm_bytes: Optional[int] = None,
) -> int:
    """Largest power-of-two batch whose compiled step fits in fraction*HBM.

    Args:
        build_step: batch -> step callable (jitted or jittable).
        example_args_fn: batch -> example args tuple (ShapeDtypeStructs fine).
        fraction: memory budget fraction (reference default 0.60-0.80).
    """
    budget = int((hbm_bytes or device_hbm_bytes()) * fraction)
    best = 1
    b = 1
    while b <= max_batch:
        try:
            need = compiled_step_bytes(build_step, b, example_args_fn)
        except Exception as e:  # noqa: BLE001 — compile OOM or shape error
            LOGGER.info(f"autobatch: batch {b} failed to compile ({type(e).__name__}); stopping")
            break
        LOGGER.info(f"autobatch: batch {b} needs {need / 1e9:.2f} GB (budget {budget / 1e9:.2f} GB)")
        if need > budget:
            break
        best = b
        b *= 2
    return best
