"""Planted pins for round-5 batch 29: skyline (Pareto frontier) and
grouped quantile_disc. Registry equality vs DuckDB at sf0.01/sf0.1 is
swept by tools/check_correctness.py."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.relational import skyline_parts
from ocr_platform_ray.functions.sketches import grouped_quantile_disc


def _parts(rows):
    """rows: (key, size, price)."""
    return rd.from_arrow(
        pa.table(
            {
                "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
                "p_size": pa.array([r[1] for r in rows], pa.int32()),
                "p_retailprice": pa.array(
                    [float(r[2]) for r in rows], pa.float64()
                ),
            }
        )
    )


def test_skyline_planted():
    rows = [
        (1, 10, 100.0),   # frontier (cheapest for size >= 10)
        (2, 20, 200.0),   # frontier
        (3, 15, 250.0),   # dominated by 2 (bigger AND cheaper)
        (4, 30, 300.0),   # frontier (biggest)
        (5, 10, 150.0),   # dominated by 1 (same size, pricier)
        (6, 5, 100.0),    # dominated by 1 (same price, smaller)
    ]
    out = skyline_parts(_parts(rows)).to_pandas()
    assert out["p_partkey"].tolist() == [1, 2, 4]


def test_skyline_duplicates_both_survive():
    rows = [(1, 10, 100.0), (2, 10, 100.0), (3, 5, 200.0)]
    out = skyline_parts(_parts(rows)).to_pandas()
    # neither duplicate dominates the other (no strict side)
    assert out["p_partkey"].tolist() == [1, 2]


def test_skyline_matches_bruteforce_fuzz():
    rng = np.random.default_rng(99)
    rows = [
        (i, int(rng.integers(1, 30)),
         float(rng.integers(50, 400)))
        for i in range(300)
    ]
    out = set(skyline_parts(_parts(rows)).to_pandas()["p_partkey"])
    want = set()
    for k, s, p in rows:
        dominated = any(
            (p2 <= p and s2 >= s and (p2 < p or s2 > s))
            for _, s2, p2 in rows
        )
        if not dominated:
            want.add(k)
    assert out == want


def test_quantile_disc_rule():
    # DuckDB rule: element at ceil(q*n) - 1; n = 4 values 1..4
    t = pa.table(
        {
            "event_type": pa.array(["a"] * 4),
            "value": pa.array([1.0, 2.0, 3.0, 4.0]),
        }
    )
    out = grouped_quantile_disc(
        rd.from_arrow(t), "event_type", "value", qs=(0.25, 0.5, 0.75, 0.9)
    ).to_pandas()
    assert out["value"].tolist() == [1.0, 2.0, 3.0, 4.0]


def test_quantile_disc_duplicates_weighting():
    # values [1,1,1,9]: median index ceil(0.5*4)-1 = 1 -> 1.0
    t = pa.table(
        {
            "event_type": pa.array(["a"] * 4),
            "value": pa.array([9.0, 1.0, 1.0, 1.0]),
        }
    )
    out = grouped_quantile_disc(
        rd.from_arrow(t), "event_type", "value", qs=(0.5, 0.9)
    ).to_pandas()
    assert out["value"].tolist() == [1.0, 9.0]
    assert out["n"].tolist() == [4, 4]
