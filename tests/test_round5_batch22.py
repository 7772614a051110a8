"""Planted pins for round-5 batch 22: the exact PPJoin-style token
Jaccard self-join. Registry equality vs DuckDB at sf0.01/sf0.1 is swept
by tools/check_correctness.py."""

import re

import numpy as np
import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.linkage import token_jaccard_join


def _docs(rows):
    """rows: (source, doc_id, text)."""
    return rd.from_arrow(
        pa.table(
            {
                "source": pa.array([r[0] for r in rows], pa.string()),
                "doc_id": pa.array([r[1] for r in rows], pa.string()),
                "text": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )


def _brute(rows, tau):
    toks = {
        (s, d): set(re.findall(r"[a-z0-9]+", t.lower()))
        for s, d, t in rows
    }
    out = set()
    keys = sorted(toks)
    for i in range(len(keys)):
        for j in range(i + 1, len(keys)):
            (sa, da), (sb, db) = keys[i], keys[j]
            if sa != sb:
                continue
            A, B = toks[(sa, da)], toks[(sb, db)]
            u = len(A | B)
            if u and len(A & B) / u >= tau:
                out.add((sa, min(da, db), max(da, db)))
    return out


def test_jaccard_join_planted():
    rows = [
        ("s1", "a", "alpha beta gamma delta epsilon"),
        ("s1", "b", "alpha beta gamma delta epsilon"),      # J = 1
        ("s1", "c", "alpha beta gamma delta zeta"),          # J = 4/6
        ("s1", "d", "totally unrelated words here now"),
        ("s2", "e", "alpha beta gamma delta epsilon"),       # other source
    ]
    out = token_jaccard_join(_docs(rows), tau=0.9).to_pandas()
    got = set(zip(out["source"], out["doc_a"], out["doc_b"]))
    assert got == {("s1", "a", "b")}
    row = out.iloc[0]
    assert row["n_inter"] == 5 and row["n_union"] == 5
    assert row["jaccard"] == 1.0


def test_jaccard_join_boundary_inclusive():
    """9 shared of 10 union = 0.9 exactly: kept (>= tau, the SQL
    comparison mirrored)."""
    rows = [
        ("s", "x", "t1 t2 t3 t4 t5 t6 t7 t8 t9"),
        ("s", "y", "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),
    ]
    out = token_jaccard_join(_docs(rows), tau=0.9).to_pandas()
    assert len(out) == 1
    assert out["jaccard"].tolist() == [0.9]


def test_jaccard_join_matches_bruteforce_fuzz():
    """Random template-ish corpus: the prefix filter must find EVERY
    qualifying pair (completeness is the whole point)."""
    rng = np.random.default_rng(777)
    base = [f"w{k}" for k in range(30)]
    rows = []
    for i in range(60):
        src = f"s{i % 3}"
        n = int(rng.integers(8, 20))
        toks = list(rng.choice(base, n, replace=False))
        rows.append((src, f"d{i:02d}", " ".join(toks)))
    for tau in (0.5, 0.7, 0.9):
        out = token_jaccard_join(_docs(rows), tau=tau).to_pandas()
        got = (
            set(zip(out["source"], out["doc_a"], out["doc_b"]))
            if len(out)
            else set()
        )
        assert got == _brute(rows, tau), f"tau={tau}"


def test_jaccard_join_duplicate_tokens_collapse():
    """Jaccard is over DISTINCT tokens: repetition doesn't change it."""
    rows = [
        ("s", "a", "cat cat cat dog"),
        ("s", "b", "cat dog dog dog"),
    ]
    out = token_jaccard_join(_docs(rows), tau=0.9).to_pandas()
    assert out["jaccard"].tolist() == [1.0]
    assert out["n_union"].tolist() == [2]
