"""Planted pins for round-5 batch 46: part price-size elasticity and
the streaming-dedup registry surface. Registry equality vs DuckDB at
sf0.01/sf0.1 is swept by tools/check_correctness.py."""

import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.relational import regr_by_group


def test_size_price_slope_planted():
    # y = 3x + 10 exactly for type A -> slope 3, intercept 10, r2 1
    part = rd.from_arrow(
        pa.table(
            {
                "p_type": pa.array(["A"] * 3 + ["B"] * 2, pa.string()),
                "p_size": pa.array([1, 2, 3, 5, 5], pa.int64()),
                "p_retailprice": pa.array(
                    [13.0, 16.0, 19.0, 7.0, 9.0], pa.float64()
                ),
            }
        )
    )
    out = (
        regr_by_group(part, "p_type", "p_size", "p_retailprice")
        .to_pandas()
        .set_index("p_type")
    )
    assert out.loc["A", "slope"] == 3.0
    assert out.loc["A", "intercept"] == 10.0
    assert out.loc["A", "r2"] == 1.0
    # type B: zero x-variance -> slope/r2 NULL (regr_slope contract)
    assert out.loc["B"].isna().all() or out.loc["B", "slope"] != out.loc[
        "B", "slope"
    ]


def test_streaming_dedup_query_surface():
    from ocr_platform_ray.state.dedup_index import streaming_dedup

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "the quick brown fox jumps over the lazy dog again",
                        "the quick brown fox jumps over the lazy dog again",
                        "a completely different document about ray data",
                    ],
                    pa.string(),
                ),
            }
        )
    )
    out = streaming_dedup(docs).to_pandas().sort_values("doc_id")
    assert len(out) == 3  # one row per doc (the rows-only contract)
    assert bool(out["is_duplicate"].iloc[2]) is False
    # exactly one of the identical pair is flagged duplicate
    assert int(out["is_duplicate"].iloc[0]) + int(
        out["is_duplicate"].iloc[1]
    ) == 1
