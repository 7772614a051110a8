"""Planted pin for round-5 batch 48: Dunning log-likelihood
collocations (the LLR scoring mode of the PMI count machinery).
Registry equality vs DuckDB at sf0.01/sf0.1 is swept by
tools/check_correctness.py."""

import math

import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.textstats import pmi_pairs


def test_llr_planted_perfect_association():
    # 5 docs {aa,bb} + 5 docs {cc,dd}: each pair has A=B=C=5, N=10
    # -> G2 = 2*(5 ln 2 + 5 ln 2) = 20 ln 2
    texts = ["aa bb"] * 5 + ["cc dd"] * 5
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(10)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    out = pmi_pairs(docs, score="llr").to_pandas()
    assert list(out.columns) == ["token_a", "token_b", "n_co", "llr"]
    # ties sort by token_a
    assert out[["token_a", "token_b"]].values.tolist() == [
        ["aa", "bb"],
        ["cc", "dd"],
    ]
    want = round(20 * math.log(2), 6)
    assert out["llr"].tolist() == [want, want]
    assert out["n_co"].tolist() == [5, 5]


def test_llr_independent_pair_scores_low():
    # aa and bb co-occur exactly at the independence rate: every doc
    # has aa, half have bb -> G2 = 0 (plus fp noise rounded away)
    texts = ["aa bb"] * 5 + ["aa cc"] * 5
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(10)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    out = pmi_pairs(docs, score="llr").to_pandas().set_index(
        ["token_a", "token_b"]
    )
    assert out.loc[("aa", "bb"), "llr"] == 0.0
    # and never -0.0 (repr-hash contract)
    assert str(out.loc[("aa", "bb"), "llr"]) == "0.0"
