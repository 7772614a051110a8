"""Planted pins for round-5 batch 21: Flesch reading ease and the
two-proportion z-test. Registry equality vs DuckDB at sf0.01/sf0.1 is
swept by tools/check_correctness.py."""

import numpy as np
import polars as pl
import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.textstats import (
    flesch_reading_ease,
    two_proportion_ztest,
)


def _docs(texts):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(
                    [f"d{i}" for i in range(len(texts))], pa.string()
                ),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def test_flesch_hand_counts():
    """'The cat sat on the mat.' -> 6 words, 1 sentence, 6 vowel
    groups: 206.835 - 1.015*6 - 84.6*1 = 116.145."""
    out = flesch_reading_ease(_docs(["The cat sat on the mat."])).to_pandas()
    assert out["w"].tolist() == [6]
    assert out["s"].tolist() == [1]
    assert out["sy"].tolist() == [6]
    assert out["flesch"].tolist() == [round(206.835 - 1.015 * 6 - 84.6, 6)]


def test_flesch_null_without_sentence_or_word():
    """No sentence marks or no words -> NULL; '...' is itself one
    word AND one sentence run (the regex semantics, same in SQL)."""
    out = flesch_reading_ease(
        _docs(["no terminal punctuation", "...", ""])
    ).to_pandas().sort_values("doc_id")
    assert np.isnan(out["flesch"].iloc[0])   # s = 0
    assert out["flesch"].iloc[1] == round(206.835 - 1.015, 6)
    assert np.isnan(out["flesch"].iloc[2])   # w = 0


def test_flesch_orders_complexity():
    """Telegraphic beats long-winded: short simple sentences score
    higher than one run-on polysyllabic sentence."""
    simple = "I run. I eat. I sleep. We go. He is."
    runon = ("Notwithstanding considerable organizational complexities, "
             "the multidisciplinary implementation committee deliberated "
             "extensively regarding infrastructural modernization.")
    out = flesch_reading_ease(_docs([simple, runon])).to_pandas()
    assert out["flesch"].iloc[0] > out["flesch"].iloc[1]


def _flagged(rows):
    return rd.from_arrow(
        pa.table(
            {
                "source": pa.array([r[0] for r in rows], pa.string()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_ztest_hand_value():
    """Group a: 3/4 flagged; rest: 1/4 flagged. Pooled p = 0.5:
    z = (0.75 - 0.25)/sqrt(0.25 * (0.5)) = 0.5/sqrt(0.125)."""
    rows = [("a", "x1"), ("a", "x2"), ("a", "x3"), ("a", "y"),
            ("b", "x9"), ("b", "y"), ("b", "y"), ("b", "y")]
    out = two_proportion_ztest(
        _flagged(rows), "source", pl.col("text").str.contains(r"[0-9]")
    ).to_pandas().set_index("source")
    want = 0.5 / np.sqrt(0.5 * 0.5 * (0.25 + 0.25))
    assert out.loc["a", "z"] == round(want, 6)
    assert out.loc["b", "z"] == round(-want, 6)
    assert out.loc["a", "n"] == 4 and out.loc["a", "x"] == 3


def test_ztest_degenerate_pooled_rate_is_null():
    """All rows flagged: pooled variance 0 -> z NULL everywhere."""
    rows = [("a", "1"), ("a", "2"), ("b", "3")]
    out = two_proportion_ztest(
        _flagged(rows), "source", pl.col("text").str.contains(r"[0-9]")
    ).to_pandas()
    assert np.isnan(out["z"]).all()


def test_ztest_partials_merge_across_blocks():
    """The same group split across input blocks merges exactly."""
    parts = [
        pa.table({"source": pa.array(["s"] * 10, pa.string()),
                  "text": pa.array(["1"] * k + ["y"] * (10 - k),
                                   pa.string())})
        for k in (2, 5)
    ]
    out = two_proportion_ztest(
        rd.from_arrow(parts).union(
            rd.from_arrow(
                pa.table({"source": pa.array(["t"] * 5, pa.string()),
                          "text": pa.array(["y"] * 5, pa.string())})
            )
        ),
        "source",
        pl.col("text").str.contains(r"[0-9]"),
    ).to_pandas().set_index("source")
    assert out.loc["s", "n"] == 20 and out.loc["s", "x"] == 7
    assert out.loc["t", "n"] == 5 and out.loc["t", "x"] == 0
