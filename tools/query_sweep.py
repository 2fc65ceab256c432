"""Steady-state timing sweep of every queries() entry in ONE warm Ray
session (two passes; report the min per query). Evidence for BENCH/ —
separates engine cost from the sandbox's cold-start and host-phase noise.

Usage: python tools/query_sweep.py [sf_dir] > BENCH/queries_rNN_steady.json
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entry

    qs = entry.queries()
    # warm the worker pool once
    next(iter(qs.values()))(sf_dir)
    out = {}
    for _ in range(2):
        for name, fn in qs.items():
            t0 = time.perf_counter()
            fn(sf_dir)
            dt = round(time.perf_counter() - t0, 3)
            out[name] = min(out.get(name, 1e9), dt)
    print(json.dumps({"sf_dir": sf_dir, "best_of": 2, "queries": out}))
    ray.shutdown()


if __name__ == "__main__":
    main()
