"""Per-stage metrics + lineage manifests.

The reference logs counters ad hoc (`MemGraph/mg_build_merge_json.py:182-183`)
and drops unmatched edges with only a warning (`Kuzu:346-347`). Here every
stage records rows in/out, drops and skew into a lineage manifest written
next to the pipeline output — no silent truncation.
"""

from __future__ import annotations

import json
import os
import time


class StageMetrics:
    def __init__(self, run_id: str):
        self.run_id = run_id
        self.stages: dict[str, dict] = {}
        self._t0 = time.perf_counter()

    def record(self, stage: str, **kv) -> None:
        entry = self.stages.setdefault(stage, {})
        entry.update(kv)

    def time_stage(self, stage: str):
        metrics = self

        class _Timer:
            def __enter__(self):
                self._start = time.perf_counter()
                return self

            def __exit__(self, *exc):
                metrics.record(stage, wall_sec=round(time.perf_counter() - self._start, 4))

        return _Timer()

    def to_dict(self) -> dict:
        return {
            "run_id": self.run_id,
            "total_wall_sec": round(time.perf_counter() - self._t0, 4),
            "stages": self.stages,
        }

    def write(self, out_dir: str, name: str = "lineage.json") -> str:
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.to_dict(), f, indent=2, sort_keys=True)
        os.replace(tmp, path)
        return path


def partition_skew(sizes: list[int]) -> dict:
    """max/mean partition-size ratio — the skew indicator for salted keys."""
    if not sizes:
        return {"n_partitions": 0, "max": 0, "mean": 0.0, "skew": 0.0}
    mean = sum(sizes) / len(sizes)
    return {
        "n_partitions": len(sizes),
        "max": max(sizes),
        "mean": round(mean, 2),
        "skew": round(max(sizes) / mean, 3) if mean else 0.0,
    }
