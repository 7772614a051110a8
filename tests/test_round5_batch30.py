"""Planted pins for round-5 batch 30: zero-run gap report, first-touch
attribution, lines-per-order histogram. Registry equality vs DuckDB at
sf0.01/sf0.1 is swept by tools/check_correctness.py."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.events import (
    first_touch_attribution,
    zero_runs,
)
from ocr_platform_ray.functions.relational import order_size_histogram

DAY_US = 86_400_000_000


def _events(rows):
    """rows: (user_id, event_id, event_type, day_float)."""
    base = 1_700_000_000_000_000
    base -= base % DAY_US
    return rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "ts": pa.array(
                    [base + int(r[3] * DAY_US) for r in rows],
                    pa.timestamp("us"),
                ),
            }
        )
    )


def test_zero_runs_planted():
    # type A: events on days 0, 1, 5, 6; silent 2-4 (one 3-day run)
    rows = [
        (1, 1, "A", 0.5), (1, 2, "A", 1.5),
        (1, 3, "A", 5.5), (1, 4, "A", 6.5),
        # type B: active every day (defines no extra gaps of its own)
        (1, 5, "B", 0.1), (1, 6, "B", 1.1), (1, 7, "B", 2.1),
        (1, 8, "B", 3.1), (1, 9, "B", 4.1), (1, 10, "B", 5.1),
        (1, 11, "B", 6.1),
    ]
    out = zero_runs(_events(rows)).to_pandas()
    a = out[out["event_type"] == "A"]
    assert len(a) == 1
    assert a.iloc[0]["run_len"] == 3
    assert len(out[out["event_type"] == "B"]) == 0


def test_zero_runs_empty_when_no_gaps():
    rows = [(1, i, "A", i * 0.5) for i in range(10)]
    out = zero_runs(_events(rows)).to_pandas()
    assert len(out) == 0
    # schema survives emptiness (the empty-Dataset hazard)
    assert list(out.columns) == [
        "event_type", "start_day", "end_day", "run_len"
    ]


def test_first_touch_planted():
    rows = [
        # u1: first = view (ts tie broken by event_id), converts
        (1, 10, "view", 0.5), (1, 11, "click", 0.5),
        (1, 12, "purchase", 1.0),
        # u2: first = click, never converts
        (2, 20, "click", 0.2), (2, 21, "view", 0.4),
        # u3: first = view, converts twice
        (3, 30, "view", 0.1), (3, 31, "purchase", 0.2),
        (3, 32, "purchase", 0.3),
    ]
    out = first_touch_attribution(_events(rows)).to_pandas().set_index(
        "channel"
    )
    assert out.loc["view", "n_users"] == 2
    assert out.loc["view", "n_converted"] == 2
    assert out.loc["view", "conv_rate"] == 1.0
    assert out.loc["click", "n_users"] == 1
    assert out.loc["click", "n_converted"] == 0
    assert out.loc["click", "conv_rate"] == 0.0


def test_first_touch_ts_tie_uses_event_id():
    rows = [
        (1, 5, "click", 1.0),
        (1, 3, "view", 1.0),  # same ts, smaller id -> the first touch
    ]
    out = first_touch_attribution(_events(rows)).to_pandas()
    assert out["channel"].tolist() == ["view"]


def test_order_size_histogram():
    keys = [1] * 3 + [2] * 3 + [3] * 1 + [4] * 5
    t = pa.table({"l_orderkey": pa.array(keys, pa.int64())})
    out = order_size_histogram(rd.from_arrow(t)).to_pandas()
    assert dict(zip(out["n_lines"], out["n_orders"])) == {
        1: 1, 3: 2, 5: 1
    }
