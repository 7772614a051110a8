"""Planted pins for round-5 batch 27: bigram conditional entropy and
the near-dup degree histogram. Registry equality vs DuckDB at
sf0.01/sf0.1 is swept by tools/check_correctness.py."""

import math

import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.linkage import dup_degree_histogram
from ocr_platform_ray.functions.textstats import bigram_cond_entropy


def _docs(texts, sources=None):
    n = len(texts)
    return rd.from_arrow(
        pa.table(
            {
                "source": pa.array(sources or ["s"] * n, pa.string()),
                "doc_id": pa.array([f"d{i}" for i in range(n)]),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def test_cond_entropy_deterministic_chain():
    """'a b a b a b ...': every bigram is fully determined by its
    first token -> H(Y|X) = 0."""
    out = bigram_cond_entropy(_docs(["a b a b a b a b a b"])).to_pandas()
    r = out.iloc[0]
    assert r["n_bigrams"] == 9 and r["n_distinct"] == 2
    assert r["h_cond"] == 0.0
    # first-token marginal: a x5, b x4 -> H(X) of the bigram starts
    p = [5 / 9, 4 / 9]
    hf = -sum(x * math.log2(x) for x in p)
    assert r["h_first"] == round(hf, 6)
    assert r["h_bigram"] == round(hf, 6)


def test_cond_entropy_uniform_branching():
    """'a b' and 'a c' equally often -> H(Y|X=a) = 1 bit."""
    out = bigram_cond_entropy(_docs(["a b", "a c"] * 3)).to_pandas()
    r = out.iloc[0]
    assert r["n_bigrams"] == 6 and r["n_distinct"] == 2
    assert r["h_cond"] == 1.0


def test_cond_entropy_crosses_doc_boundary_never():
    """Bigrams never span documents: two one-token docs -> none."""
    out = bigram_cond_entropy(_docs(["hello", "world"])).to_pandas()
    assert out.iloc[0]["n_bigrams"] == 0
    assert out.iloc[0]["h_cond"] is None or out.iloc[0]["h_cond"] != out.iloc[0]["h_cond"]


def test_dup_degree_planted():
    # d0, d1, d2 identical (triangle: degree 2 each); d3 unique
    texts = ["x y z w v"] * 3 + ["totally different words here"]
    out = dup_degree_histogram(_docs(texts), tau=0.9).to_pandas()
    hist = dict(zip(out["degree"], out["n_docs"]))
    assert hist == {0: 1, 2: 3}
    assert int(out["n_docs"].sum()) == 4


def test_dup_degree_all_unique():
    texts = [f"unique tokens number {i} are here now" for i in range(5)]
    out = dup_degree_histogram(_docs(texts), tau=0.9).to_pandas()
    assert out["degree"].tolist() == [0]
    assert out["n_docs"].tolist() == [5]
