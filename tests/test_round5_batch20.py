"""Planted pins for round-5 batch 20: single mean-shift changepoint and
STL-lite daily decomposition. Registry equality vs DuckDB at
sf0.01/sf0.1 is swept by tools/check_correctness.py."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.events import changepoint_daily, stl_daily

DAY_US = 86_400_000_000


def _events(day_counts):
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


def test_changepoint_finds_planted_shift():
    """5 days at 2/day then 5 days at 9/day: the best split is exactly
    at the regime change (day index 5 = 1970-01-06)."""
    out = changepoint_daily(
        _events({"s": [2] * 5 + [9] * 5})
    ).to_pandas()
    assert out["cp_day"].tolist() == ["1970-01-06"]
    assert out["mean_before"].tolist() == [2.0]
    assert out["mean_after"].tolist() == [9.0]
    # d = 10*5 - 45*5 = -175; score = 175^2 / (5*5*10) = 122.5
    assert out["score"].tolist() == [122.5]


def test_changepoint_flat_series_picks_first_tie():
    """A constant series scores 0 at every split: the argmax tie-break
    picks the SMALLEST split (day index 1)."""
    out = changepoint_daily(_events({"f": [3] * 6})).to_pandas()
    assert out["cp_day"].tolist() == ["1970-01-02"]
    assert out["score"].tolist() == [0.0]


def test_changepoint_two_types_independent():
    out = changepoint_daily(
        _events({"a": [1] * 4 + [10] * 4, "b": [10] * 2 + [1] * 6})
    ).to_pandas().set_index("event_type")
    assert out.loc["a", "cp_day"] == "1970-01-05"
    assert out.loc["b", "cp_day"] == "1970-01-03"


def test_stl_constant_plus_weekly_bump():
    """21 days of base 5 with +7 every dow-0 day: trend = 6 on full
    windows (one bump per window), seasonal captures the bump, and the
    remainder is 0 everywhere the decomposition is defined."""
    ys = []
    for d in range(21):
        dow = (d + 4) % 7
        ys.append(5 + (7 if dow == 0 else 0))
    out = stl_daily(_events({"w": ys})).to_pandas().sort_values("day")
    tr = out["trend"].to_numpy()
    assert np.isnan(tr[:3]).all() and np.isnan(tr[-3:]).all()
    assert (tr[3:-3] == 6.0).all()
    rem = out["remainder"].to_numpy()
    ok = ~np.isnan(rem)
    assert ok.sum() == 15
    assert (np.abs(rem[ok]) <= 1e-6).all()
    # seasonal: +6 on the bump dow (7 - mean lift 1), -1 elsewhere
    sea = out["seasonal"].to_numpy()
    dows = (np.arange(21) + 4) % 7
    assert (sea[(dows == 0) & ~np.isnan(tr)] == 6.0).all()
    assert (sea[(dows == 3) & ~np.isnan(tr)] == -1.0).all()


def test_stl_short_series_no_trend():
    """Fewer than 7 grid days: trend (and so seasonal/remainder) is
    NULL everywhere, raw counts still emitted."""
    out = stl_daily(_events({"s": [1, 2, 3]})).to_pandas()
    assert out["n"].tolist() == [1, 2, 3]
    assert out["trend"].isna().all()
    assert out["seasonal"].isna().all()
    assert out["remainder"].isna().all()
