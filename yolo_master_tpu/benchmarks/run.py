"""CLI for the named benchmark-suite catalog (reference: benchmarks/run.py).

    python -m yolo_master_tpu.benchmarks.run --list
    python -m yolo_master_tpu.benchmarks.run --suite mixture_smoke --device cpu
"""

from __future__ import annotations

import argparse
from pathlib import Path

from ..utils import yaml_load
from .suite import BenchmarkSuite

CATALOG = Path(__file__).resolve().parents[2] / "benchmarks" / "suites.yaml"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--suite", default="default", help="suite name from the catalog")
    ap.add_argument("--catalog", default=str(CATALOG))
    ap.add_argument("--list", action="store_true", help="list suites and exit")
    ap.add_argument("--case", dest="cases", action="append",
                    help="run one entry by name; repeat to select several")
    ap.add_argument("--device", choices=("cpu", "tpu"), default=None,
                    help="force the jax platform (cpu = virtual host devices)")
    ap.add_argument("--output", default=None, help="results JSON path")
    ap.add_argument("--force", action="store_true", help="ignore cached results")
    args = ap.parse_args(argv)

    cat = yaml_load(args.catalog)
    suites = cat.get("suites", {})
    if args.list:
        for name, entries in suites.items():
            print(f"{name}: {len(entries)} entries — {', '.join(e['name'] for e in entries)}")
        return 0
    if args.suite not in suites:
        raise SystemExit(f"unknown suite '{args.suite}' (have: {sorted(suites)})")
    if args.device:
        import jax

        jax.config.update("jax_platforms", "cpu" if args.device == "cpu" else None)
    entries = suites[args.suite]
    if args.cases:
        entries = [e for e in entries if e["name"] in set(args.cases)]
    save = args.output or f"runs/bench/{args.suite}.json"
    if args.force and Path(save).exists():
        Path(save).unlink()
    results = BenchmarkSuite(entries, save_path=save).run()
    import json

    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
