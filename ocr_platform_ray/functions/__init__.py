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


def default_n_buckets(per_cpu: int = 4, floor: int = 64) -> int:
    """Coarse-bucket count sized to the CLUSTER, not a constant: ~4 Ray
    groups per CPU keeps every core busy through the groupby tail while
    paying per-group scheduling as few times as possible. A fixed 512 was
    measured 1.3-1.6x SLOWER than 128 at sf0.1/32 CPUs (sessions 1.70 ->
    1.07 s, tumbling windows 2.11 -> 1.69 s, running totals 1.9 -> 1.1 s:
    512 tiny 2-column groups are pure scheduling overhead), while at 8k
    cores the same rule yields 32k buckets — each bucket's payload stays
    worker-heap-sized at 100 TB. Bucket count never changes RESULTS (all
    rows of a key co-locate regardless), only scheduling granularity."""
    try:
        import ray

        if ray.is_initialized():
            ncpu = int(ray.cluster_resources().get("CPU", 0))
            if ncpu > 0:
                return max(floor, per_cpu * ncpu)
    except Exception:
        pass
    return max(floor, 128)


def bucketed_group_apply(ds, key_cols, fn, n_buckets: int | None = None,
                         batch_format: str = "pandas"):
    """The repo's many-small-keys groupby idiom as a reusable primitive:
    hash the key columns into ``n_buckets`` coarse buckets (column ``cb``),
    ``groupby("cb")``, and call ``fn`` once per BUCKET — ``fn`` must
    itself sub-group by the key columns, vectorized (pandas/polars).
    Per-group scheduling and per-call DataFrame construction are paid
    ``n_buckets`` times, not once per distinct key (one map_groups call
    per key was measured at ~5 s for 13.5k keys at sf0.01). All rows of
    one key land in one bucket, so any per-key computation (top-k,
    quantile, gap scan) is exact. The bucket column is stripped before
    ``fn`` sees the group. ``n_buckets=None`` sizes to the cluster via
    :func:`default_n_buckets` (~4 per CPU)."""
    import pyarrow as pa  # noqa: F811 — local import, package stays light
    import polars as pl

    if n_buckets is None:
        n_buckets = default_n_buckets()
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)

    def add_cb(batch: pa.Table) -> pa.Table:
        d = pl.from_arrow(batch)
        h = None
        for i, c in enumerate(keys):
            hc = d[c].hash(seed=i)
            h = hc if h is None else h ^ hc
        return d.with_columns((h % n_buckets).cast(pl.Int64).alias("cb")).to_arrow()

    # NOTE (measured, round 5): per-group OUTPUT block format matters in
    # the tails — many TINY string frames from map_groups are pathological
    # as pandas blocks (27 buckets x 190 string rows: 10.4 s pandas vs
    # ~2 s arrow — q_js_divergence, which therefore uses
    # batch_format="pyarrow"), but a blanket from_pandas conversion here
    # REGRESSED large-output buckets ~1.5x (q_line_dedup 3.1 -> 4.6 s:
    # extra copy). Pick the format per operator: arrow for many-small-
    # group outputs, pandas when fn's output is a large pandas frame.
    if batch_format == "pandas":
        def run(g):
            return fn(g.drop(columns=["cb"]))
    else:
        def run(g):
            return fn(g.drop(["cb"]))

    return (
        ds.map_batches(add_cb, batch_format="pyarrow")
        .groupby("cb")
        .map_groups(run, batch_format=batch_format)
    )
