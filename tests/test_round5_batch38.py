"""Planted pins for round-5 batch 38: repeat-purchase stats. Registry
equality vs DuckDB at sf0.01/sf0.1 is swept by
tools/check_correctness.py."""

import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.relational import repeat_purchase_stats


def test_repeat_purchase_planted():
    # orders: 1,2 -> cust 10; 3 -> cust 20
    orders = rd.from_arrow(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                "o_custkey": pa.array([10, 10, 20], pa.int64()),
            }
        )
    )
    # cust 10 buys part 7 in BOTH orders (repeat), part 8 once;
    # cust 20 buys part 7 once; duplicate lines must not double-count
    lineitem = rd.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array([1, 1, 1, 2, 3], pa.int64()),
                "l_partkey": pa.array([7, 7, 8, 7, 7], pa.int64()),
            }
        )
    )
    out = repeat_purchase_stats(lineitem, orders).to_pandas().iloc[0]
    # pairs: (10,7) n=2; (10,8) n=1; (20,7) n=1
    assert out["n_pairs"] == 3
    assert out["n_repeat"] == 1
    assert out["repeat_rate"] == round(1 / 3, 6)
    assert out["max_orders"] == 2
