"""Planted pins for round-5 batch 47: line-layout fingerprint and
order-spend Gini. Registry equality vs DuckDB at sf0.01/sf0.1 is swept
by tools/check_correctness.py."""

import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.textstats import line_profile


def test_line_profile_planted():
    docs = rd.from_arrow(
        pa.table(
            {
                "source": pa.array(["s", "s"], pa.string()),
                "text": pa.array(["ab\ncd\nef", "xyz"], pa.string()),
            }
        )
    )
    out = line_profile(docs).to_pandas()
    # doc1: 3 lines (2 newlines), doc2: 1 line -> 4 lines over 2 docs
    assert out["n_docs"].tolist() == [2]
    assert out["n_lines"].tolist() == [4]
    assert out["avg_lines_per_doc"].tolist() == [2.0]
    # non-newline chars: (8-2) + 3 = 9 over 4 lines
    assert out["avg_line_len"].tolist() == [2.25]


def test_line_profile_empty_text():
    docs = rd.from_arrow(
        pa.table(
            {
                "source": pa.array(["s"], pa.string()),
                "text": pa.array([""], pa.string()),
            }
        )
    )
    out = line_profile(docs).to_pandas()
    # empty doc still counts as one (empty) line
    assert out["n_lines"].tolist() == [1]
    assert out["avg_line_len"].tolist() == [0.0]


def test_spend_gini_planted_equal_values_zero():
    from ocr_platform_ray.functions.sketches import gini_by_group

    ds = rd.from_arrow(
        pa.table(
            {
                "g": pa.array(["a"] * 4, pa.string()),
                "v": pa.array([5, 5, 5, 5], pa.int64()),
            }
        )
    )
    out = gini_by_group(ds, "g", "v").to_pandas()
    assert out["gini"].tolist() == [0.0]
