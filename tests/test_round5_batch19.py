"""Planted pins for round-5 batch 19: column profiler (exact distributed
distinct), LOCF carry-forward feature, rolling daily median. Registry
equality vs DuckDB at sf0.01/sf0.1 is swept by tools/check_correctness.py."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.events import rolling_median_daily
from ocr_platform_ray.functions.relational import carry_forward, profile_table

DAY_US = 86_400_000_000


def test_profile_counts_nulls_and_distinct():
    t = pa.table(
        {
            "a": pa.array(["x", "y", "x", None, "z", "x"], pa.string()),
            "b": pa.array([1, 1, 2, 2, None, 3], pa.int64()),
        }
    )
    out = (
        profile_table(rd.from_arrow(t), ["a", "b"])
        .to_pandas()
        .set_index("column")
    )
    assert out.loc["a"].tolist() == [6, 1, 3]
    assert out.loc["b"].tolist() == [6, 1, 3]


def test_profile_distinct_partitions_across_blocks():
    """Distinct values repeated across many input blocks must count
    once: 4 blocks all containing the same two values."""
    parts = [
        pa.table({"v": pa.array(["p", "q"], pa.string())})
        for _ in range(4)
    ]
    ds = rd.from_arrow(parts)
    out = profile_table(ds, ["v"]).to_pandas()
    assert out["n"].tolist() == [8]
    assert out["n_distinct"].tolist() == [2]


def _events(rows):
    """rows: (user, ts_us, event_id, type, value)."""
    return rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "event_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
            }
        )
    )


def test_carry_forward_point_in_time():
    """Marks carry forward within a user, never backward, never across
    users."""
    rows = [
        (1, 10, 0, "view", 1.0),
        (1, 20, 1, "purchase", 9.5),
        (1, 30, 2, "view", 2.0),
        (1, 40, 3, "purchase", 4.25),
        (1, 50, 4, "click", 3.0),
        (2, 15, 5, "view", 8.0),   # user 2: no purchase before this
        (2, 25, 6, "purchase", 7.0),
    ]
    out = (
        carry_forward(
            _events(rows),
            group_col="user_id",
            order_cols=["ts", "event_id"],
            value_col="value",
            mark_col="event_type",
            mark_value="purchase",
            out_col="lp",
        )
        .to_pandas()
        .sort_values("event_id")
    )
    got = out["lp"].tolist()
    assert np.isnan(got[0])          # before first purchase
    assert got[1:5] == [9.5, 9.5, 4.25, 4.25]
    assert np.isnan(got[5])          # user 2 pre-purchase
    assert got[6] == 7.0


def test_carry_forward_does_not_leak_across_bucketed_groups():
    """Many users in one bucket: the carry restarts at every group
    boundary (the in-bucket restart logic)."""
    rows = []
    eid = 0
    for u in range(50):
        rows.append((u, 10, eid, "view", float(u))); eid += 1
        rows.append((u, 20, eid, "purchase", 100.0 + u)); eid += 1
        rows.append((u, 30, eid, "view", 0.0)); eid += 1
    out = (
        carry_forward(
            _events(rows), "user_id", ["ts", "event_id"], "value",
            "event_type", "purchase", out_col="lp",
        )
        .to_pandas()
        .sort_values("event_id")
    )
    lp = out["lp"].to_numpy()
    assert np.isnan(lp[0::3]).all()            # first row of each user
    assert (lp[1::3] == 100.0 + np.arange(50)).all()
    assert (lp[2::3] == 100.0 + np.arange(50)).all()


def _daily(day_counts):
    rows = [(t, d) for t, days in day_counts.items()
            for d, n in enumerate(days) for _ in range(n)]
    return rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "ts": pa.array(
                    [r[1] * DAY_US + 1 for r in rows], pa.timestamp("us")
                ),
            }
        )
    )


def test_rolling_median_ignores_spike():
    """A single 50x spike day leaves the 7-day rolling median at the
    base level everywhere."""
    ys = [4] * 11
    ys[5] = 200
    out = rolling_median_daily(_daily({"s": ys})).to_pandas()
    assert out["median7"].tolist() == [4.0] * 11


def test_rolling_median_truncated_edges():
    """Edge windows truncate: day 0 of [1,2,3,4,5,6,7] sees {1,2,3,4},
    median interpolates to 2.5 (quantile_cont weighted form)."""
    out = (
        rolling_median_daily(_daily({"e": [1, 2, 3, 4, 5, 6, 7]}))
        .to_pandas()
        .sort_values("day")
    )
    assert out["median7"].tolist() == [2.5, 3.0, 3.5, 4.0, 4.5, 5.0, 5.5]
