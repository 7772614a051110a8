"""Planted pins for round-5 batch 37: customer segment migration.
Registry equality vs DuckDB at sf0.01/sf0.1 is swept by
tools/check_correctness.py."""

import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.relational import segment_migration

DAY_US = 86_400_000_000


def _orders(rows):
    """rows: (custkey, day, price)."""
    base = 1_500_000_000_000_000
    base -= base % DAY_US
    return rd.from_arrow(
        pa.table(
            {
                "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_orderdate": pa.array(
                    [base + r[1] * DAY_US for r in rows],
                    pa.timestamp("us"),
                ),
                "o_totalprice": pa.array(
                    [float(r[2]) for r in rows], pa.float64()
                ),
            }
        )
    )


def test_segment_migration_planted():
    # days 0..9 -> mid = 5 (H1 = days 0-4, H2 = days 5-9)
    rows = [
        # 4 customers active in both halves with distinct revenues:
        # H1 order: c1 cheapest .. c4 richest; H2 reversed
        (1, 0, 10.0), (1, 9, 40.0),
        (2, 1, 20.0), (2, 8, 30.0),
        (3, 2, 30.0), (3, 7, 20.0),
        (4, 3, 40.0), (4, 6, 10.0),
        # customer 5: H1 only (churn); customer 6: H2 only (new)
        (5, 4, 99.0),
        (6, 5, 99.0),
    ]
    out = segment_migration(_orders(rows), k=4).to_pandas()
    cells = {
        (r["tile_h1"], r["tile_h2"]): r["n_customers"]
        for _, r in out.iterrows()
    }
    # H1 active: {1:10, 2:20, 3:30, 4:40, 5:99} -> quintile... k=4 over
    # n=5: tiles = ceil(4*rank/5): ranks 1..5 -> 1,2,3,4,4
    # H2 active: {1:40, 2:30, 3:20, 4:10, 6:99} -> same rule
    assert cells[(1, 4)] == 1          # cust 1: H1 poorest -> H2 rank 4
    assert cells[(4, 0)] == 1          # cust 5: churned
    assert cells[(0, 4)] == 1          # cust 6: new, richest (rank 5 -> 4)
    assert sum(cells.values()) == 6
    # full-matrix integrity: every customer in exactly one cell
    assert out["n_customers"].sum() == 6


def test_segment_migration_all_one_half():
    rows = [(1, 0, 10.0), (2, 1, 20.0), (3, 2, 30.0), (4, 3, 40.0)]
    out = segment_migration(_orders(rows), k=4).to_pandas()
    # mid = (0 + 3 + 1)//2 = 2: customers 1,2 in H1; 3,4 in H2
    cells = {
        (r["tile_h1"], r["tile_h2"]): r["n_customers"]
        for _, r in out.iterrows()
    }
    assert (0, 0) not in cells
    assert sum(n for (a, b), n in cells.items() if b == 0) == 2
    assert sum(n for (a, b), n in cells.items() if a == 0) == 2
