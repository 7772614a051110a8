"""Planted pins for round-5 batch 33: TWAP per user and active-days
histogram. Registry equality vs DuckDB at sf0.01/sf0.1 is swept by
tools/check_correctness.py."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.events import (
    active_days_histogram,
    twap_per_user,
)

HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000


def _events(rows):
    """rows: (user_id, event_id, hour_float, value)."""
    base = 1_700_000_000_000_000
    base -= base % DAY_US
    return rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array(
                    [base + int(r[2] * HOUR_US) for r in rows],
                    pa.timestamp("us"),
                ),
                "value": pa.array([float(r[3]) for r in rows]),
            }
        )
    )


def test_twap_burst_does_not_drown_long_hold():
    # u1 holds value 1 for 10h, then 10 rapid readings of 99 over
    # ~10 min, then a final marker reading. Plain mean of the first
    # 11 observations would be ~90; TWAP stays near 1.
    rows = [(1, 0, 0.0, 1.0)]
    for k in range(10):
        rows.append((1, k + 1, 10.0 + k * 0.017, 99.0))
    rows.append((1, 99, 10.2, 0.0))  # terminal marker (dropped)
    out = twap_per_user(_events(rows)).to_pandas()
    tw = out.iloc[0]["twap"]
    assert tw < 4.0  # duration-weighted: the 10h hold dominates
    # exact recompute
    us = [0.0] + [10.0 + k * 0.017 for k in range(10)] + [10.2]
    us = [int(h * HOUR_US) for h in us]
    vals = [1.0] + [99.0] * 10
    w = np.diff(np.array(us, dtype=np.int64)).astype(np.float64)
    want = float((np.array(vals) * w).sum() / w.sum())
    assert tw == round(want, 6)
    assert out.iloc[0]["n"] == 11


def test_twap_single_event_user_emits_nothing():
    out = twap_per_user(_events([(1, 1, 0.0, 5.0)])).to_pandas()
    assert len(out) == 0


def test_twap_same_instant_null():
    rows = [(1, 1, 0.0, 5.0), (1, 2, 0.0, 7.0)]
    out = twap_per_user(_events(rows)).to_pandas()
    assert len(out) == 1 and pd.isna(out.iloc[0]["twap"])


def test_active_days_histogram_planted():
    rows = [
        (1, 1, 1.0, 0), (1, 2, 2.0, 0),            # u1: 1 day (2 events)
        (2, 3, 1.0, 0), (2, 4, 25.0, 0),           # u2: 2 days
        (3, 5, 1.0, 0), (3, 6, 30.0, 0), (3, 7, 50.0, 0),  # u3: 3 days
        (4, 8, 5.0, 0),                            # u4: 1 day
    ]
    out = active_days_histogram(_events(rows)).to_pandas()
    assert dict(zip(out["active_days"], out["n_users"])) == {
        1: 2, 2: 1, 3: 1
    }
