"""Planted pins for round-5 batch 26: RFM quintile segmentation, XmR
control chart, hour x dow heatmap. Registry equality vs DuckDB at
sf0.01/sf0.1 is swept by tools/check_correctness.py."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.events import (
    hour_dow_heatmap,
    rfm_segments,
    xmr_chart,
)

DAY_US = 86_400_000_000
HOUR_US = 3_600_000_000


def _events(rows):
    """rows: (user_id, day_float, value)."""
    base = 1_700_000_000_000_000
    base -= base % DAY_US
    return rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array(["e"] * len(rows), pa.string()),
                "ts": pa.array(
                    [base + int(r[1] * DAY_US) for r in rows],
                    pa.timestamp("us"),
                ),
                "value": pa.array(
                    [float(r[2]) for r in rows], pa.float64()
                ),
            }
        )
    )


def test_rfm_five_distinct_users():
    # 5 users with strictly increasing r, f, m -> each its own quintile
    rows = []
    for u in range(5):
        # user u: last active day u (r = 4-u), u+1 events, value u+1 each
        for k in range(u + 1):
            rows.append((u, u - k * 0.001, float(u + 1)))
    out = rfm_segments(_events(rows)).to_pandas()
    assert len(out) == 5
    assert int(out["n_users"].sum()) == 5
    assert (out["share"] == 0.2).all()
    # user 4: most recent (r=0 -> tile 1), most frequent (tile 5),
    # highest monetary (tile 5)
    assert ((out["r_tile"] == 1) & (out["f_tile"] == 5)
            & (out["m_tile"] == 5)).any()
    # user 0: r tile 5, f tile 1, m tile 1
    assert ((out["r_tile"] == 5) & (out["f_tile"] == 1)
            & (out["m_tile"] == 1)).any()


def test_rfm_all_tied_single_segment():
    # identical users -> every dimension ties -> max-rank puts all in
    # tile 5 (rank_max = n -> ceil(5n/n) = 5), ONE segment
    rows = [(u, 1.0 + u * 1e-9, 10.0) for u in range(8)]
    # same day, same count (1), same value
    out = rfm_segments(_events(rows)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["r_tile"], r["f_tile"], r["m_tile"]) == (5, 5, 5)
    assert r["n_users"] == 8 and r["share"] == 1.0


def test_xmr_planted():
    # constant 4/day for 9 days, one day with 10
    rows = []
    for d in range(9):
        n = 10 if d == 4 else 4
        rows += [(1, d + 0.3, 1.0)] * n
    out = xmr_chart(_events(rows)).to_pandas().sort_values("day")
    x = out["n"].to_numpy()
    center = x.sum() / len(x)
    mr = np.abs(np.diff(x)).sum() / (len(x) - 1)
    assert (out["center"] == round(center, 6)).all()
    assert (out["ucl"] == round(center + 2.66 * mr, 6)).all()
    assert (out["lcl"] == round(center - 2.66 * mr, 6)).all()
    # the spike day breaches the upper limit
    assert out.iloc[4]["breach"] == 1
    assert out["breach"].sum() == 1


def test_hour_dow_planted():
    base = 1_700_000_000_000_000
    base -= base % DAY_US  # a day boundary
    dow0 = (base // DAY_US + 4) % 7
    t = pa.table(
        {
            "ts": pa.array(
                [base + 2 * HOUR_US] * 3          # day 0, hour 2
                + [base + DAY_US + 5 * HOUR_US],  # day 1, hour 5
                pa.timestamp("us"),
            )
        }
    )
    out = hour_dow_heatmap(rd.from_arrow(t)).to_pandas()
    assert len(out) == 2
    cell = out.set_index(["dow", "hour"])
    assert cell.loc[(dow0, 2), "n"] == 3
    assert cell.loc[((dow0 + 1) % 7, 5), "n"] == 1
    assert cell.loc[(dow0, 2), "share"] == 0.75
