"""Media-codec throughput bench: >= 50k synthetic payloads per codec
through the actor-pool decode pipelines at 32 CPUs, with an actor-count
sweep — the corpus-scale evidence the per-query media benches (<= 64
tiny payloads each) don't give. Writes one JSON blob to stdout; drive
with::

    python tools/media_bench.py [--n 50000] [--out BENCH/media_codecs_r05.json]

Corpus GENERATION also runs distributed (an encode map_batches stage),
so both directions of each codec are measured. Payloads are small on
purpose (16..56 px images, ~0.2 s audio): the bench measures the
Python/numpy codec kernels and the actor-pool scheduling, not object
store bandwidth.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _jpeg_corpus(n: int):
    """(i) params -> encoded JPEG payloads, built in parallel tasks."""
    import ray.data as rd

    from kgray import multimodal

    def encode(t: pa.Table) -> pa.Table:
        payloads = []
        for i in t["i"].to_pylist():
            w, h = 8 * (2 + (i * 3) % 6), 8 * (2 + (i * 5) % 6)
            by, bx = np.mgrid[0: h // 8, 0: w // 8]
            v = (37 * i + 17 * bx + 29 * by) % 256
            img = np.kron(v, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)
            payloads.append(multimodal.encode_jpeg(img, quality=34))
        return pa.table(
            {
                "media_id": pa.array([f"j{i}" for i in t["i"].to_pylist()]),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )

    return rd.range(n).map_batches(
        lambda b: pa.table({"i": pa.array(b["id"], pa.int64())}),
        batch_format="numpy",
    ).map_batches(encode, batch_format="pyarrow", batch_size=256)


def _gif_corpus(n: int):
    import ray.data as rd

    from kgray import multimodal

    pal = np.stack([
        np.arange(8) * 32 + 16,
        255 - np.arange(8) * 32,
        (np.arange(8) * 64 + 96) % 256,
    ], axis=1).astype(np.uint8)

    def encode(t: pa.Table) -> pa.Table:
        payloads = []
        for i in t["i"].to_pylist():
            w, h = 8 + (i * 5) % 24, 8 + (i * 7) % 24
            nf = 2 + i % 5
            frames = np.stack([
                np.full((h, w), (i + 3 * f) % 8, dtype=np.uint8)
                for f in range(nf)
            ])
            payloads.append(multimodal.encode_gif(frames, pal))
        return pa.table(
            {
                "media_id": pa.array([f"g{i}" for i in t["i"].to_pylist()]),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )

    return rd.range(n).map_batches(
        lambda b: pa.table({"i": pa.array(b["id"], pa.int64())}),
        batch_format="numpy",
    ).map_batches(encode, batch_format="pyarrow", batch_size=256)


def _wav_corpus(n: int):
    import ray.data as rd

    from kgray import multimodal

    def encode(t: pa.Table) -> pa.Table:
        payloads = []
        for i in t["i"].to_pylist():
            rate = 8000
            dur = 1600 + (i * 37) % 800  # 0.2-0.3 s
            k = np.arange(dur)
            x = (3000 * np.sin(2 * np.pi * (100 + i % 50) * k / rate)).astype(np.int16)
            payloads.append(multimodal.encode_wav(x, rate))
        return pa.table(
            {
                "media_id": pa.array([f"w{i}" for i in t["i"].to_pylist()]),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )

    return rd.range(n).map_batches(
        lambda b: pa.table({"i": pa.array(b["id"], pa.int64())}),
        batch_format="numpy",
    ).map_batches(encode, batch_format="pyarrow", batch_size=256)


def run(n: int, cpus: int, actor_sweep, batch_size: int = 128):
    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR", log_to_driver=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from kgray import multimodal

    report = {"n_per_codec": n, "num_cpus": cpus, "codecs": {}}
    codecs = {
        "jpeg": (_jpeg_corpus, multimodal.RawImagePipeline, {"target": 64}),
        "gif": (_gif_corpus, multimodal.GifFramePipeline, {"n_sample": 4}),
        "wav": (_wav_corpus, multimodal.AudioFeaturePipeline, {}),
    }
    for name, (gen, cls, kwargs) in codecs.items():
        t0 = time.perf_counter()
        corpus = gen(n).materialize()
        t_enc = time.perf_counter() - t0
        entry = {
            "encode_sec": round(t_enc, 3),
            "encode_items_per_sec": round(n / t_enc, 1),
            "decode": {},
        }
        for actors in actor_sweep:
            t0 = time.perf_counter()
            out = corpus.map_batches(
                cls,
                fn_constructor_kwargs=kwargs,
                batch_format="pyarrow",
                batch_size=batch_size,
                concurrency=actors,
            ).materialize()
            dt = time.perf_counter() - t0
            assert out.count() == n
            entry["decode"][str(actors)] = {
                "sec": round(dt, 3),
                "items_per_sec": round(n / dt, 1),
            }
        base = entry["decode"][str(actor_sweep[0])]["items_per_sec"]
        top = entry["decode"][str(actor_sweep[-1])]["items_per_sec"]
        entry["actor_scaling_efficiency"] = round(
            (top / base) / (actor_sweep[-1] / actor_sweep[0]), 3
        )
        report["codecs"][name] = entry
    ray.shutdown()
    return report





def run_wds(n_shards: int, members: int, cpus: int):
    """Tar/WebDataset ingestion at corpus shape: write ``n_shards``
    shards of ``members`` JPEG samples each (plus a .json sidecar per
    sample), then read them back with suffix pruning and decode through
    the actor-pool JPEG pipeline — the end-to-end path a real
    multimodal corpus takes. One shard per task both ways."""
    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR", log_to_driver=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import shutil
    import tempfile

    import ray.data as rd

    from kgray import multimodal
    from kgray.graph_io import read_tar_shards, write_tar_shards

    n = n_shards * members
    corpus = _jpeg_corpus(n).map_batches(
        lambda t: pa.table(
            {
                "key": t["media_id"],
                "jpg": t["payload"],
                "json": pa.array(
                    [b'{"k":1}'] * t.num_rows, type=pa.binary()
                ),
            }
        ),
        batch_format="pyarrow",
    ).repartition(n_shards)
    tmp = tempfile.mkdtemp(prefix="wds_bench_")
    try:
        t0 = time.perf_counter()
        man = write_tar_shards(corpus, tmp, ["jpg", "json"]).take_all()
        t_w = time.perf_counter() - t0
        total_bytes = sum(os.path.getsize(m["path"]) for m in man)
        t0 = time.perf_counter()
        out = read_tar_shards(
            [m["path"] for m in man], suffixes=("jpg",),
            include_shard=False,
        ).map_batches(
            lambda t: pa.table({"media_id": t["key"], "payload": t["jpg"]}),
            batch_format="pyarrow",
        ).map_batches(
            multimodal.RawImagePipeline,
            fn_constructor_kwargs={"target": 64},
            batch_format="pyarrow", batch_size=128, concurrency=16,
        ).materialize()
        t_r = time.perf_counter() - t0
        assert out.count() == n
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    rep = {
        "n_shards": n_shards, "members_per_shard": members,
        "n_samples": n, "num_cpus": cpus,
        "shard_bytes_total": total_bytes,
        "write_sec": round(t_w, 3),
        "write_samples_per_sec": round(n / t_w, 1),
        "read_decode_sec": round(t_r, 3),
        "read_decode_samples_per_sec": round(n / t_r, 1),
        "note": ("read path includes suffix pruning (json members never "
                 "extracted) AND the full pure-numpy JPEG decode + "
                 "feature stage at 16 actors"),
    }
    ray.shutdown()
    return rep


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    ap.add_argument("--actors", default="4,8,16,32")
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--out", default=None)
    ap.add_argument("--wds-shards", type=int, default=0,
                    help="run the tar/WebDataset ingestion bench instead")
    ap.add_argument("--wds-members", type=int, default=512)
    args = ap.parse_args()
    sweep = [int(x) for x in args.actors.split(",")]
    if args.wds_shards:
        rep = run_wds(args.wds_shards, args.wds_members, args.cpus)
    else:
        rep = run(args.n, args.cpus, sweep, batch_size=args.batch_size)
    line = json.dumps(rep)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
