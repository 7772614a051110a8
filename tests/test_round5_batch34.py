"""Planted pins for round-5 batch 34: vocabulary-coverage budget and
the parquet layout audit. Registry equality vs DuckDB at sf0.01/sf0.1
is swept by tools/check_correctness.py."""

import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.textstats import vocab_coverage
from ocr_platform_ray.sources import parquet_layout_audit


def _docs(texts):
    return rd.from_arrow(pa.table({"text": pa.array(texts)}))


def test_vocab_coverage_planted():
    # counts: a x8, b x1, c x1 -> total 10, vocab 3
    out = vocab_coverage(
        _docs(["a a a a", "a a a a b c"]), qs=(0.5, 0.9, 0.99)
    ).to_pandas().iloc[0]
    assert out["total_occurrences"] == 10
    assert out["vocab_size"] == 3
    # 50%: target 5 -> 'a' alone (8 >= 5) -> k=1
    assert out["k50"] == 1
    # 90%: target 9 -> a(8) + one singleton -> k=2
    assert out["k90"] == 2
    # 99%: target 9.9 -> a + both singletons -> k=3
    assert out["k99"] == 3


def test_vocab_coverage_uniform():
    # 10 tokens, each once: k_q = ceil(q*10)
    out = vocab_coverage(
        _docs([" ".join(f"w{i}" for i in range(10))]),
        qs=(0.5, 0.9, 0.99),
    ).to_pandas().iloc[0]
    assert out["k50"] == 5
    assert out["k90"] == 9
    assert out["k99"] == 10


def test_parquet_audit_reads_footers():
    out = parquet_layout_audit("/root/testdata/sf0.001").to_pandas()
    assert set(out["table"]) >= {"documents", "events", "lineitem"}
    docs = out[out["table"] == "documents"].iloc[0]
    assert docs["n_rows"] > 0
    assert docs["n_row_groups"] >= 1
    assert docs["max_rg_rows"] <= docs["n_rows"]
    assert docs["compressed_bytes"] > 0
    assert docs["n_columns"] == 5
