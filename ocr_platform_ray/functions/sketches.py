"""Mergeable sketches: HyperLogLog approximate distinct count.

The mergeable-sketch pattern for wide aggregations at scale: each batch
emits ONE serialized sketch per key (vectorized register update), a tiny
groupby merges registers with elementwise max — the shuffle moves
2^p-byte sketches, never values. Deterministic (splitmix64-derived
hashing, no RNG), standard published algorithm (Flajolet et al.).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

P = 12                 # 4096 registers; relative error ~ 1.04/sqrt(2^p) ~ 1.6%
M = 1 << P
_ALPHA = 0.7213 / (1 + 1.079 / M)


def _hash64(values: pa.Array) -> np.ndarray:
    import polars as pl

    s = pl.Series("v", values)
    return s.hash(seed=0).to_numpy().astype(np.uint64)


def _registers(values: pa.Array) -> np.ndarray:
    """Vectorized register array for one batch of values."""
    regs = np.zeros(M, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = _hash64(values)
    idx = (h & np.uint64(M - 1)).astype(np.int64)
    rest = h >> np.uint64(P)
    # rank = number of leading... position of first set bit in the remaining
    # 64-p bits, 1-based; rest==0 -> max rank
    nz = rest != 0
    rank = np.full(len(h), 64 - P + 1, dtype=np.uint8)
    # bit_length via log2 on uint64->float is unsafe for high bits; use
    # np.frexp on float64 conversion of values < 2^53 is risky: do it with
    # a 4-step binary search on integers (vectorized, exact)
    r = rest[nz]
    bl = np.zeros(r.shape, dtype=np.uint8)  # bit_length of r
    for shift in (32, 16, 8, 4, 2, 1):
        m = r >= (np.uint64(1) << np.uint64(shift))
        bl[m] += shift
        r = np.where(m, r >> np.uint64(shift), r)
    bl += 1  # bit_length: highest set bit position (1-based)
    rank[nz] = ((64 - P) - bl + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def estimate(regs: np.ndarray) -> float:
    """Standard HLL estimate with small-range correction."""
    regs = regs.astype(np.float64)
    est = _ALPHA * M * M / np.sum(2.0 ** (-regs))
    if est <= 2.5 * M:
        zeros = int((regs == 0).sum())
        if zeros:
            est = M * np.log(M / zeros)
    return float(est)


def approx_distinct_per_key(
    ds: rd.Dataset, key: str, value: str
) -> rd.Dataset:
    """Approximate distinct ``value`` count per ``key``: per-batch partial
    sketches -> groupby merge (elementwise max) -> estimate."""

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key)
        out_k, out_s = [], []
        df_idx = pd.Series(range(batch.num_rows))
        kvals = keys.to_pylist()
        groups: dict = {}
        for i, kv in enumerate(kvals):
            groups.setdefault(kv, []).append(i)
        vcol = batch.column(value)
        for kv, rows in groups.items():
            out_k.append(kv)
            out_s.append(_registers(vcol.take(pa.array(rows))).tobytes())
        return pa.Table.from_pydict(
            {key: out_k, "sketch": out_s},
            schema=pa.schema([(key, keys.type), ("sketch", pa.binary())]),
        )

    partials = ds.select_columns([key, value]).map_batches(
        partial, batch_format="pyarrow"
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(M, dtype=np.uint8)
        for s in g["sketch"]:
            regs = np.maximum(regs, np.frombuffer(s, dtype=np.uint8))
        return pd.DataFrame(
            {
                key: [g[key].iloc[0]],
                "approx_distinct": [int(round(estimate(regs)))],
            }
        )

    return partials.groupby(key).map_groups(merge, batch_format="pandas")


# ---------------------------------------------------- mergeable quantile sketch

SKETCH_POINTS = 256   # stride-sample size per (batch, key); rank error <= N/(2*S)


def _stride_sample(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Equi-depth summary of one batch: S order statistics at stride
    centers, each carrying weight n/S (all points, weight 1, when n <= S).
    Deterministic; merging summaries keeps total rank error <= N/(2S)."""
    v = np.sort(vals.astype(np.float64))
    n = len(v)
    if n <= SKETCH_POINTS:
        return v, np.ones(n)
    idx = ((np.arange(SKETCH_POINTS) + 0.5) * n / SKETCH_POINTS).astype(np.int64)
    return v[np.minimum(idx, n - 1)], np.full(SKETCH_POINTS, n / SKETCH_POINTS)


def quantile_sketch_per_key(
    ds: rd.Dataset, key: str, value: str, quantiles: dict[str, float]
) -> rd.Dataset:
    """Approximate per-key quantiles via a mergeable equi-depth summary:
    each batch emits one (points, weights) summary per key (<= 4 KB), the
    groupby merges summaries by weighted concatenation — the shuffle moves
    summaries, never values. ``quantiles``: {output_col: q}. Deterministic;
    rank error bounded by 1/(2*SKETCH_POINTS) of the key's row count."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                key: batch.column(key).to_pylist(),
                value: batch.column(value).to_numpy(zero_copy_only=False),
            }
        )
        out_k, out_p, out_w = [], [], []
        for kv, sub in df.groupby(key, sort=True):
            pts, wts = _stride_sample(sub[value].to_numpy())
            out_k.append(kv)
            out_p.append(pts.tobytes())
            out_w.append(wts.tobytes())
        return pa.Table.from_pydict(
            {key: out_k, "points": out_p, "weights": out_w},
            schema=pa.schema(
                [(key, batch.column(key).type),
                 ("points", pa.binary()), ("weights", pa.binary())]
            ),
        )

    partials = ds.select_columns([key, value]).map_batches(
        partial, batch_format="pyarrow"
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        pts = np.concatenate([np.frombuffer(p, dtype=np.float64) for p in g["points"]])
        wts = np.concatenate([np.frombuffer(w, dtype=np.float64) for w in g["weights"]])
        order = np.argsort(pts, kind="mergesort")
        pts, wts = pts[order], wts[order]
        cum = np.cumsum(wts)
        total = cum[-1]
        row = {key: [g[key].iloc[0]]}
        for name, q in quantiles.items():
            # smallest point whose cumulative weight reaches q*total
            i = int(np.searchsorted(cum, q * total, side="left"))
            row[name] = [round(float(pts[min(i, len(pts) - 1)]), 6)]
        return pd.DataFrame(row)

    return partials.groupby(key).map_groups(merge, batch_format="pandas")
