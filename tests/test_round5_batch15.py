"""Planted pins for the round-5 batch-15 daily-series monitors: CUSUM
control line (Page 1954) and day-of-week seasonality profile. Registry
equality at sf0.01/sf0.1 is swept by tools/check_correctness.py."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.events import cusum_daily, dow_profile

DAY_US = 86_400_000_000


def _events(rows):
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


def test_cusum_in_control_stays_zero():
    """A constant series has x - mu - k = -k < 0 every day: the CUSUM
    line is pinned at 0 throughout."""
    rows = [("flat", d) for d in range(10) for _ in range(4)]
    out = cusum_daily(_events(rows)).to_pandas()
    assert out["cusum"].tolist() == [0.0] * 10


def test_cusum_accumulates_on_sustained_shift():
    """5 quiet days (2/day) then 5 elevated days (8/day): mu = 5,
    slack = 0.5; the quiet half clamps at 0, then the shift adds
    8 - 5.5 = 2.5/day — hand recurrence mirrored exactly."""
    rows = []
    for d in range(5):
        rows += [("shift", d)] * 2
    for d in range(5, 10):
        rows += [("shift", d)] * 8
    out = cusum_daily(_events(rows), k_frac=0.1).to_pandas()
    got = out.sort_values("day")["cusum"].tolist()
    want = []
    s = 0.0
    mu = 50.0 / 10.0
    k = 0.1 * mu
    for x in [2.0] * 5 + [8.0] * 5:
        s = max(0.0, s + ((x - mu) - k))
        want.append(round(s, 6))
    assert got == want
    assert got[4] == 0.0 and got[9] == 12.5


def test_cusum_resets_after_recovery():
    """A one-day spike decays back to 0 at rate mu+k per day once the
    series returns to its (sub-mean) base level."""
    rows = []
    for d in range(8):
        rows += [("spike", d)] * (20 if d == 3 else 1)
    out = cusum_daily(_events(rows)).to_pandas().sort_values("day")
    cu = out["cusum"].tolist()
    assert cu[2] == 0.0          # in control before the spike
    assert cu[3] > 10.0          # the spike registers
    assert cu[7] < cu[3]         # decaying
    # decay slope between post-spike days is exactly -(mu - 1 + k),
    # mu = 27/8 over the 8-day grid, k = 0.1*mu
    assert round(cu[4] - cu[5], 6) == round(
        (27.0 / 8.0) * 1.1 - 1.0, 6
    )


def test_dow_profile_planted_two_weeks():
    """14 days starting at day_id 0 (Thu 1970-01-01): every dow gets
    exactly 2 days; events only on dow 0 (Sundays, day_id 3 and 10)."""
    rows = [("w", 3)] * 6 + [("w", 10)] * 4
    # pad the grid ends so the span is exactly 14 days
    rows += [("w", 0), ("w", 13)]
    out = dow_profile(_events(rows)).to_pandas()
    assert sorted(out["dow"].tolist()) == list(range(7))
    assert out["n_days"].tolist() == [2] * 7
    sun = out[out["dow"] == 0].iloc[0]
    assert int(sun["total"]) == 10
    assert sun["mean_n"] == 5.0
    assert sun["share"] == round(10.0 / 12.0, 6)
    thu = out[out["dow"] == 4].iloc[0]   # Thursdays: day 0 and 7
    assert int(thu["total"]) == 1
