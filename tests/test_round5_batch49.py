"""Planted pins for round-5 batch 49: Bloom-pre-filtered exact semi
join. Registry equality vs DuckDB at sf0.01/sf0.1 is swept by
tools/check_correctness.py."""

import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.joins import bloom_semi_join

LSCH = pa.schema([pa.field("k", pa.int64()), pa.field("v", pa.string())])
RSCH = pa.schema([pa.field("rk", pa.int64())])


def _left(keys, vals):
    return rd.from_arrow(
        pa.table({"k": pa.array(keys, pa.int64()),
                  "v": pa.array(vals, pa.string())})
    )


def _right(keys):
    return rd.from_arrow(pa.table({"rk": pa.array(keys, pa.int64())}))


def test_bloom_semi_join_exact_result():
    left = _left([1, 2, 3, 4, 5, 6], list("abcdef"))
    right = _right([2, 4, 6, 6])  # dup right keys must not dup output
    out = (
        bloom_semi_join(left, right, on="k", right_on="rk",
                        left_schema=LSCH, right_schema=RSCH)
        .to_pandas()
        .sort_values("k")
    )
    assert out["k"].tolist() == [2, 4, 6]
    assert out["v"].tolist() == ["b", "d", "f"]
    assert list(out.columns) == ["k", "v"]  # semi: left columns only


def test_bloom_semi_join_empty_right():
    left = _left([1, 2], ["a", "b"])
    right = _right([])
    out = bloom_semi_join(left, right, on="k", right_on="rk",
                          left_schema=LSCH, right_schema=RSCH)
    assert out.count() == 0


def test_bloom_semi_join_tiny_filter_still_exact():
    # m_bits=64 forces heavy Bloom false positives; the exact verify
    # stage must still produce the precise semi-join result
    left = _left(list(range(100)), [str(i) for i in range(100)])
    right = _right([7, 42])
    out = (
        bloom_semi_join(left, right, on="k", right_on="rk", m_bits=64,
                        n_probes=2, left_schema=LSCH, right_schema=RSCH)
        .to_pandas()
        .sort_values("k")
    )
    assert out["k"].tolist() == [7, 42]
