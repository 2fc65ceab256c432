"""Measure the selectivity-greedy join-order pre-pass (bgp_match
reorder) across every BGP-routed queries() entry.

Usage: python tools/bench_reorder.py [sf_dir] [out_json]

Runs each query twice per arm, interleaved (off, on, off, on) with the
best-of-2 kept per arm, toggling ``kgray.bgp.REORDER_DEFAULT`` — the
resolved default for callers that don't pass ``reorder`` explicitly
(run_sparql passes its own policy and measures as parity). Writes a
JSON report used to decide the default flip (VERDICT r3 next-item #7:
flip if no query loses >5%).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "incremental_inference", "bgp_paths", "bgp_optional", "bgp_filtered",
    "sparql_select", "bgp_seeded", "bgp_union_shapes", "causes_with_treats",
    "ask_treats_chain", "describe_entity", "multi_treated",
    "non_partof_pairs", "treats_rollup", "datalog_ancestors",
    "part_of_connected", "leaf_treatments", "treats_ancestors",
    "sparql_seq_path", "sparql_select_topk", "sparql_bind_expr",
    "sparql_groupby_agg", "sparql_subquery_avg", "inferred_treats",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = (
        sys.argv[2] if len(sys.argv) > 2
        else "BENCH/reorder_compare_r04.json"
    )
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as entrymod
    from kgray import bgp

    queries = entrymod.queries()

    def run_once(name: str) -> float:
        t0 = time.time()
        res = queries[name](sf_dir)
        if hasattr(res, "count"):
            res.count()
        return time.time() - t0

    report = {}
    for name in QUERIES:
        if name not in queries:
            continue
        times = {"off": [], "on": []}
        for _ in range(2):
            for arm, flag in (("off", False), ("on", True)):
                bgp.REORDER_DEFAULT = flag
                times[arm].append(round(run_once(name), 3))
        bgp.REORDER_DEFAULT = False
        off, on = min(times["off"]), min(times["on"])
        report[name] = {
            "off_s": off, "on_s": on,
            "ratio": round(on / off, 3) if off else None,
            "raw": times,
        }
        print(f"{name:24s} off={off:.2f}s on={on:.2f}s "
              f"ratio={report[name]['ratio']}")
    losses = {
        n: r for n, r in report.items()
        if r["ratio"] and r["ratio"] > 1.05 and (r["on_s"] - r["off_s"]) > 0.05
    }
    summary = {
        "sf_dir": sf_dir,
        "queries": report,
        "losers_over_5pct": sorted(losses),
        "flip_recommended": not losses,
    }
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(json.dumps({"losers": sorted(losses),
                      "flip_recommended": not losses,
                      "out": out_path}))
    ray.shutdown()


if __name__ == "__main__":
    main()
