"""Planted pins for round-5 batch 42: reorder cadence (co-grouped
join + window + grouped quantile) and the char-class fingerprint.
Registry equality vs DuckDB at sf0.01/sf0.1 is swept by
tools/check_correctness.py."""

import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.relational import reorder_cadence
from ocr_platform_ray.functions.textstats import char_classes

DAY_US = 86_400_000_000


def _orders(specs):
    """specs: (custkey, day_number)."""
    return rd.from_arrow(
        pa.table(
            {
                "o_custkey": pa.array([s[0] for s in specs], pa.int64()),
                "o_orderdate": pa.array(
                    [s[1] * DAY_US for s in specs], pa.timestamp("us")
                ),
            }
        )
    )


def _cust(specs):
    return rd.from_arrow(
        pa.table(
            {
                "c_custkey": pa.array([s[0] for s in specs], pa.int64()),
                "c_mktsegment": pa.array([s[1] for s in specs], pa.string()),
            }
        )
    )


def test_reorder_cadence_planted():
    # seg A: cust 1 orders on days 0,10,20 (gaps 10,10); cust 2 on
    # days 0,30 (gap 30) -> gaps [10,10,30]: p50=10, p90=26
    # seg B: cust 3 single order -> no gaps -> segment absent
    orders = _orders([(1, 0), (1, 10), (1, 20), (2, 0), (2, 30), (3, 5)])
    cust = _cust([(1, "A"), (2, "A"), (3, "B")])
    out = reorder_cadence(orders, cust).to_pandas()
    assert out["mktsegment"].tolist() == ["A"]
    assert out["n_gaps"].tolist() == [3]
    assert out["p50_days"].tolist() == [10.0]
    # pos = 2*0.9 = 1.8 -> 10*(0.2) + 30*0.8 = 26
    assert out["p90_days"].tolist() == [26.0]


def test_reorder_cadence_same_day_orders_zero_gap():
    orders = _orders([(1, 7), (1, 7)])
    cust = _cust([(1, "X")])
    out = reorder_cadence(orders, cust).to_pandas()
    assert out["n_gaps"].tolist() == [1]
    assert out["p50_days"].tolist() == [0.0]


def test_char_classes_planted():
    docs = rd.from_arrow(
        pa.table(
            {
                "source": pa.array(["s", "s"], pa.string()),
                "text": pa.array(["ab 12\n", "x!"], pa.string()),
            }
        )
    )
    out = char_classes(docs).to_pandas()
    # chars 6+2=8; letters a,b,x=3; digits 1,2=2; ws ' ','\n'=2; other '!'=1
    assert out["n_chars"].tolist() == [8]
    assert out["letter_ratio"].tolist() == [0.375]
    assert out["digit_ratio"].tolist() == [0.25]
    assert out["space_ratio"].tolist() == [0.25]
    assert out["other_ratio"].tolist() == [0.125]


def test_char_classes_unicode_counts_as_other():
    docs = rd.from_arrow(
        pa.table(
            {
                "source": pa.array(["s"], pa.string()),
                "text": pa.array(["é1"], pa.string()),
            }
        )
    )
    out = char_classes(docs).to_pandas()
    assert out["n_chars"].tolist() == [2]  # CHARS, not bytes
    assert out["letter_ratio"].tolist() == [0.0]  # ASCII class only
    assert out["digit_ratio"].tolist() == [0.5]
    assert out["other_ratio"].tolist() == [0.5]
