"""Calendar-report operators: daily_counts_filled + ewma_daily.

The query-level gates are exact DuckDB oracles (q_daily_filled,
q_ewma_daily — the latter a recursive CTE) at sf0.01 AND sf0.1; these
pin hand-computed values, the zero-fill contract and the loud guards.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from ocr_platform_ray.functions.events import daily_counts_filled, ewma_daily

DAY_US = 86_400_000_000


def make_events(rows):
    """rows: list of (event_type, day_offset)."""
    return rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "ts": pa.array(
                    [r[1] * DAY_US + 7 for r in rows], pa.timestamp("us")
                ),
            }
        )
    )


class TestDailyFilled:
    def test_zero_fill_and_counts(self, ray_session):
        ds = make_events([("a", 0), ("a", 0), ("a", 2), ("b", 1)])
        out = daily_counts_filled(ds).to_pandas()
        # dense grid: 2 types x 3 days
        assert len(out) == 6
        got = {(r.event_type, r.day): r.n for r in out.itertuples()}
        assert got[("a", "1970-01-01")] == 2
        assert got[("a", "1970-01-02")] == 0  # gap filled
        assert got[("a", "1970-01-03")] == 1
        assert got[("b", "1970-01-02")] == 1
        assert got[("b", "1970-01-01")] == 0
        assert got[("b", "1970-01-03")] == 0

    def test_guard_raises(self, ray_session):
        ds = make_events([("a", i) for i in range(50)])
        with pytest.raises(ValueError, match="partials"):
            daily_counts_filled(ds, max_cells=10)

    def test_empty_keeps_schema(self, ray_session):
        out = daily_counts_filled(make_events([]))
        # Dataset.to_pandas() drops columns at 0 rows (Ray quirk); the
        # driver-facing contract is the dataset SCHEMA, which survives
        assert sorted(out.schema().names) == ["day", "event_type", "n"]
        assert out.count() == 0


class TestEwmaDaily:
    def test_hand_recurrence(self, ray_session):
        ds = make_events([("a", 0), ("a", 0), ("a", 0), ("a", 2)])
        out = ewma_daily(ds, alpha=0.3).to_pandas().sort_values("day")
        # n = [3, 0, 1]; s0=3, s1=.3*0+.7*3=2.1, s2=.3*1+.7*2.1=1.77
        np.testing.assert_allclose(
            out["ewma"].to_numpy(), [3.0, 2.1, 1.77], atol=5e-7
        )
        assert out["n"].tolist() == [3, 0, 1]

    def test_constant_series_is_fixed_point(self, ray_session):
        ds = make_events([("a", i) for i in range(10)])
        out = ewma_daily(ds).to_pandas()
        np.testing.assert_allclose(out["ewma"].to_numpy(), 1.0)

    def test_empty_keeps_schema(self, ray_session):
        out = ewma_daily(make_events([]))
        assert sorted(out.schema().names) == [
            "day", "event_type", "ewma", "n"
        ]
        assert out.count() == 0
