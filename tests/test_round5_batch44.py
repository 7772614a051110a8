"""Planted pins for round-5 batch 44: hour-of-day entropy and pairwise
audience overlap. Registry equality vs DuckDB at sf0.01/sf0.1 is swept
by tools/check_correctness.py."""

import math

import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.events import hour_entropy, type_user_overlap

HOUR_US = 3_600_000_000


def test_hour_entropy_planted():
    base = 1_700_000_000_000_000
    base -= base % (24 * HOUR_US)
    # cron: all at hour 3 -> entropy 0; spread: hours 0 and 12 evenly
    ev = rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(
                    ["cron"] * 4 + ["spread"] * 4, pa.string()
                ),
                "ts": pa.array(
                    [base + 3 * HOUR_US + i for i in range(4)]
                    + [base, base + 12 * HOUR_US, base + 1,
                       base + 12 * HOUR_US + 1],
                    pa.timestamp("us"),
                ),
            }
        )
    )
    out = hour_entropy(ev).to_pandas().set_index("event_type")
    assert out.loc["cron", "hour_entropy_nats"] == 0.0
    assert out.loc["cron", "n_active_hours"] == 1
    assert out.loc["spread", "hour_entropy_nats"] == round(math.log(2), 6)
    assert out.loc["spread", "n_active_hours"] == 2
    assert out["n_events"].tolist() == [4, 4]


def test_type_user_overlap_planted():
    # users: 1 {a,b}, 2 {a}, 3 {b}, 4 {a,b,c}
    ev = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1, 2, 3, 4, 4, 4], pa.int64()),
                "event_type": pa.array(
                    ["a", "b", "a", "b", "a", "b", "c"], pa.string()
                ),
            }
        )
    )
    out = type_user_overlap(ev).to_pandas()
    out = out.set_index(["t1", "t2"])
    # a∩b = {1,4}; a∪b = {1,2,3,4}
    assert out.loc[("a", "b"), "n_both"] == 2
    assert out.loc[("a", "b"), "n_either"] == 4
    assert out.loc[("a", "b"), "jaccard"] == 0.5
    # a∩c = {4}; a∪c = {1,2,4}
    assert out.loc[("a", "c"), "jaccard"] == round(1 / 3, 6)
    # b∩c = {4}; b∪c = {1,3,4}
    assert out.loc[("b", "c"), "n_both"] == 1


def test_type_user_overlap_disjoint_pair_absent():
    ev = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 2], pa.int64()),
                "event_type": pa.array(["a", "b"], pa.string()),
            }
        )
    )
    out = type_user_overlap(ev).to_pandas()
    assert len(out) == 0  # no shared users -> inner-join contract
