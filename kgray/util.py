"""Small shared helpers."""

from __future__ import annotations

_configured = False


def configure_data_context() -> None:
    """Engine-wide Ray Data execution settings (idempotent).

    - HASH_SHUFFLE: keyed exchanges (groupby / repartition(keys=...)) use
      the parallel hash shuffle instead of a global sort — our keyed ops
      never need sorted output, and the sort-based path bottlenecks on
      single-task sort stages.
    """
    global _configured
    if _configured:
        return
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    _configured = True


# per-worker-process instance cache for stateful_task_batches; one slot per
# class so long-lived Ray workers never pin more than the latest instance
_TASK_STAGE_CACHE: dict = {}


def stateful_task_batches(ds, cls, fn_kwargs: dict | None = None, **map_kwargs):
    """``map_batches`` for LIGHT-state callable classes, run as TASKS with a
    per-worker-process instance cache instead of an actor pool.

    An actor pool pays a fresh pool spin-up on EVERY dataset execution
    (~2s measured on this host) — worth it when ``__init__`` builds heavy
    state (the entity linker's alias index), pure latency for stages whose
    setup is a few KB of hash planes or permutation coefficients. Ray's
    task workers are long-lived processes, so caching the instance per
    (class, kwargs) keeps construct-once-per-worker semantics with zero
    pool latency — and the cache even survives across queries in the same
    session, which a per-execution pool cannot.

    Correct keying requires that EVERYTHING distinguishing an instance is
    in ``fn_kwargs`` (pass large payloads as ``ray.put`` refs — the repr of
    an ObjectRef is unique per put, and ``ray.get`` of a local object is
    zero-copy). One instance per class per worker (latest kwargs wins)
    bounds worker memory.
    """
    fn_kwargs = fn_kwargs or {}
    key = (cls.__module__, cls.__qualname__, repr(sorted(fn_kwargs.items())))

    def run(batch, _key=key, _cls=cls, _kw=fn_kwargs):
        slot = _TASK_STAGE_CACHE.get(_key[:2])
        if slot is None or slot[0] != _key:
            slot = (_key, _cls(**_kw))
            _TASK_STAGE_CACHE[_key[:2]] = slot
        return slot[1](batch)

    return ds.map_batches(run, **map_kwargs)


def pool_concurrency(cap: int = 64, floor: int = 4) -> tuple[int, int]:
    """Actor-pool autoscale bounds sized to the cluster: (1, #CPUs) capped.

    A fixed small max (e.g. 8) starves wide sessions; a pool reserving every
    CPU starves the read/write stages — autoscaling between 1 and the CPU
    count lets the streaming executor balance."""
    try:
        import ray

        n = int(ray.cluster_resources().get("CPU", floor)) if ray.is_initialized() else floor
    except Exception:
        n = floor
    return (1, max(floor, min(cap, n)))

def join_partitions(requested: int, n_rows: int | None = None,
                    rows_per_partition: int = 4096) -> int:
    """Clamp a hash-join partition count to what the cluster can schedule.

    Ray's hash-shuffle join runs one aggregator actor per partition;
    requesting far more aggregators than the session has CPUs deadlocks the
    streaming executor (verified: ``num_partitions=32`` on a 4-CPU local
    session never completes, while 8 does). Clamping to the CPU count keeps
    wide sessions at full fan-out and makes small test sessions safe. When
    the caller knows the input row count, also clamp so dimension-sized
    inputs don't fan out into empty build partitions (acero rejects the
    schema-less blocks they produce)."""
    cap = requested
    try:
        import ray

        if ray.is_initialized():
            cap = min(cap, int(ray.cluster_resources().get("CPU", cap)))
    except Exception:
        pass
    if n_rows is not None:
        # ceil, floor 1: a build side at or under one partition's worth of
        # rows gets exactly ONE partition, which can never be empty — the
        # guaranteed-safe shape for acero (the forced-shuffle test regime;
        # production key counts exceed the broadcast limit and always land
        # on the CPU cap above)
        cap = min(cap, max(1, -(-n_rows // rows_per_partition)))
    return max(1, cap)


def list_to_matrix(col, dtype="float64"):
    """Zero-copy-ish (n, dim) matrix from an Arrow list<float*> column.

    The Arrow child values buffer is viewed as one numpy vector and
    reshaped — no per-element Python objects (`to_pylist` in a per-batch
    vector kernel was the old path: ~30x slower and 3x the heap). Handles
    fixed_size_list and uniform-width variable lists (the embedding-table
    shape); null rows fall back to the object path, and ragged input
    raises exactly as the old ``np.asarray(to_pylist())`` did.
    """
    import numpy as np
    import pyarrow as pa

    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(a)
    if n == 0:
        return np.zeros((0, 0), dtype=dtype)
    if pa.types.is_fixed_size_list(a.type):
        if a.null_count == 0:
            flat = a.flatten().to_numpy(zero_copy_only=False)
            return np.ascontiguousarray(
                flat.reshape(n, a.type.list_size).astype(dtype, copy=False)
            )
        return np.asarray(a.to_pylist(), dtype=dtype)
    widths = np.diff(a.offsets.to_numpy())
    dim = int(widths[0]) if len(widths) else 0
    if a.null_count == 0 and (widths == dim).all():
        flat = a.flatten().to_numpy(zero_copy_only=False)
        return np.ascontiguousarray(
            flat.reshape(n, dim).astype(dtype, copy=False)
        )
    return np.asarray(a.to_pylist(), dtype=dtype)
