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
