"""Stream-shaped operators over the events table (event-log pattern:
tumbling windows, sessionization). Ray Data has no event-time runtime;
windows are computed as (key, window_id) aggregates with per-batch partial
pre-aggregation, sessions as per-user sorted gap analysis in map_groups
(ordering assumption: within one user group, rows are sorted by ts before
the gap scan)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from . import round_half_away

US_PER_HOUR = 3_600_000_000


def tumbling_window_counts(ds: rd.Dataset, window_us: int = US_PER_HOUR) -> rd.Dataset:
    """Per (event_type, window) count + value sum. Partial aggregation in
    map_batches (one row per key per batch) shrinks the groupby shuffle to
    ~|keys| x |batches| rows."""

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        win = ts // window_us
        df = pd.DataFrame(
            {
                "event_type": batch.column("event_type").to_pylist(),
                "window_id": win,
                "value": batch.column("value").to_numpy(zero_copy_only=False),
            }
        )
        agg = df.groupby(["event_type", "window_id"], as_index=False).agg(
            n_events=("value", "size"), value_sum=("value", "sum")
        )
        return pa.Table.from_pandas(agg, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "window_id": [g["window_id"].iloc[0]],
                "n_events": [int(g["n_events"].sum())],
                "value_sum": [round_half_away(float(g["value_sum"].sum()), 6)],
            }
        )

    return partials.groupby(["event_type", "window_id"]).map_groups(
        final, batch_format="pandas"
    )


def sliding_window_counts(
    ds: rd.Dataset,
    window_us: int = US_PER_HOUR,
    slide_us: int = US_PER_HOUR // 4,
) -> rd.Dataset:
    """Sliding windows: each event lands in every window [w*slide,
    w*slide + window) containing its ts — exploded per batch (numpy
    repeat), then the same partial-agg + groupby as tumbling windows."""

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        w_hi = ts // slide_us
        w_lo = (ts - window_us) // slide_us + 1
        counts = (w_hi - w_lo + 1).astype(np.int64)
        ev = np.repeat(
            np.asarray(batch.column("event_type").to_pylist(), dtype=object), counts
        )
        val = np.repeat(batch.column("value").to_numpy(zero_copy_only=False), counts)
        # per-event window ids: w_lo[i] .. w_hi[i]
        offs = np.concatenate([[0], np.cumsum(counts)])
        win = np.arange(offs[-1]) - np.repeat(offs[:-1], counts) + np.repeat(w_lo, counts)
        df = pd.DataFrame({"event_type": ev, "window_id": win, "value": val})
        agg = df.groupby(["event_type", "window_id"], as_index=False).agg(
            n_events=("value", "size"), value_sum=("value", "sum")
        )
        return pa.Table.from_pandas(agg, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "window_id": [int(g["window_id"].iloc[0])],
                "n_events": [int(g["n_events"].sum())],
                "value_sum": [round_half_away(float(g["value_sum"].sum()), 6)],
            }
        )

    return partials.groupby(["event_type", "window_id"]).map_groups(
        final, batch_format="pandas"
    )


def sessions_per_user(ds: rd.Dataset, gap_minutes: int = 30) -> rd.Dataset:
    """Session count per user: sort within user group by ts; a session
    starts at the first event or when the gap from the previous event
    exceeds ``gap_minutes``."""
    gap_us = gap_minutes * 60_000_000

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g["ts"].astype("int64").to_numpy())
        n_sessions = 1 + int((np.diff(ts) > gap_us).sum()) if len(ts) else 0
        return pd.DataFrame(
            {"user_id": [g["user_id"].iloc[0]], "n_sessions": [n_sessions],
             "n_events": [len(g)]}
        )

    return ds.select_columns(["user_id", "ts"]).groupby("user_id").map_groups(
        per_user, batch_format="pandas"
    )
