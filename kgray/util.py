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
