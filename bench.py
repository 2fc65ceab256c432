"""Benchmark harness — headline KG-construction pipeline + operator queries.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, ...}

``--scaling`` runs the headline job twice in fresh subprocesses
(num_cpus=8 then 32) on the same input and reports both throughputs plus
scaling efficiency (the sandbox stand-in for the N vs 4N cluster-size
criterion; see BASELINE.md).

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32),
     KGRAY_BENCH_REPEAT (default 25 — corpus replication factor).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPEAT = int(os.environ.get("KGRAY_BENCH_REPEAT", "25"))


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import __ray_entry__ as entry
    from kgray.pipeline import run_flagship
    from kgray.transcripts import transcripts_dataset

    # warm the page cache (untimed): one pass over the inputs
    transcripts_dataset(SF_DIR).count()

    # headline: full flagship KG pipeline at corpus x REPEAT
    out_dir = f"/tmp/kgray_bench/num_cpus={NUM_CPUS}"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    res = run_flagship(SF_DIR, out_dir, repeat=REPEAT, resume=False)
    headline = time.perf_counter() - t0
    n_turns = res["metrics"]["stages"]["link"]["triples_in"]  # triples, see below
    # turn count: derive from the corpus definition (cheap count)
    n_turns = transcripts_dataset(SF_DIR, repeat=REPEAT).count()

    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    queries = {}
    if not os.environ.get("KGRAY_BENCH_HEADLINE_ONLY"):
        for name in [
            "q1_pricing", "exact_dedup", "orders_per_nation", "windowed_events",
            "sessions", "knn_bruteforce", "quality_scores", "minhash_pairs",
            "kg_extract",
        ]:
            fn = entry.queries()[name]
            t0 = time.perf_counter()
            fn(SF_DIR)
            queries[name] = round(time.perf_counter() - t0, 3)

    out = {
        "metric": "kg_flagship_pipeline_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "bench_repeat": REPEAT,
        "turns": n_turns,
        "turns_per_sec": round(n_turns / headline, 1),
        "n_edges": res["metrics"]["stages"]["write"]["n_edges"],
        "n_nodes": res["metrics"]["stages"]["write"]["n_nodes"],
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            KGRAY_BENCH_HEADLINE_ONLY="1",
            # scaling needs a compute-bound corpus: per-turn kernel work is
            # ~6.5us/core, so amortize fixed pipeline latency with volume
            KGRAY_BENCH_REPEAT=os.environ.get("KGRAY_SCALING_REPEAT", "400"),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    eff = (lo["value"] / hi["value"]) / (32 / 8)
    return {
        "metric": "scaling_efficiency_8_to_32_cpus",
        "sec_8": lo["value"],
        "sec_32": hi["value"],
        "turns": lo["turns"],
        "turns_per_sec_8": lo["turns_per_sec"],
        "turns_per_sec_32": hi["turns_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "sf": lo["sf"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
