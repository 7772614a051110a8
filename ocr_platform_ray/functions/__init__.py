"""Large-scale training-data-pipeline operators (dedup, text analysis,
similarity search, windowed events) — first-class components alongside the
extraction engine (task contract), all Ray-Data-first: vectorized
map_batches with partial pre-aggregation before any shuffle."""

import math


def round_half_away(x: float, ndigits: int) -> float:
    """Round half away from zero — DuckDB's rounding mode, used on both
    sides of every float aggregate so the driver's value-hash can't be
    flipped by Python/pyarrow banker's rounding."""
    m = 10.0 ** ndigits
    return math.floor(abs(x) * m + 0.5) / m * (1.0 if x >= 0 else -1.0)


# per-WORKER-PROCESS broadcast cache: Ray reuses worker processes across
# tasks, so the first task on a worker resolves a ray.put broadcast from
# the object store and every later task on that worker hits the cache —
# the same once-per-process amortization an actor pool's __init__ gives,
# WITHOUT paying a fresh pool spawn (~1-2 s) on every one-shot query.
# Bounded: broadcasts are per-query, so keep only the most recent few.
_BROADCAST_CACHE: dict = {}


def resolve_broadcast(ref):
    """Resolve a ``ray.put`` ObjectRef through the per-worker cache."""
    import ray

    key = ref.hex()
    v = _BROADCAST_CACHE.get(key)
    if v is None:
        v = ray.get(ref)
        if len(_BROADCAST_CACHE) >= 4:
            _BROADCAST_CACHE.clear()
        _BROADCAST_CACHE[key] = v
    return v


def round_half_away_np(x, ndigits: int):
    """Vectorized :func:`round_half_away` over a numpy array — bit-identical
    per element to the scalar version (same floor(|x|*m + 0.5)/m * sign)."""
    import numpy as np

    m = 10.0 ** ndigits
    return np.floor(np.abs(x) * m + 0.5) / m * np.where(np.asarray(x) >= 0, 1.0, -1.0)
