"""Planted pins for spearman_by_group (exact doubled-rank moments) and
langid_kappa (chance-corrected agreement), plus sf0.001 DuckDB equality
for both registry queries (bigger scales swept by check_correctness)."""

import math

import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.relational import spearman_by_group
from ocr_platform_ray.functions.textstats import langid_batch, langid_kappa


def _spearman(rows):
    t = pa.table(
        {
            "g": pa.array([r[0] for r in rows], pa.string()),
            "x": pa.array([r[1] for r in rows], pa.int64()),
            "y": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    out = spearman_by_group(rd.from_arrow(t), "g", "x", "y").to_pandas()
    return {r.g: (int(r.n), r.spearman) for r in out.itertuples()}


def test_spearman_planted_groups():
    rows = (
        # perfect monotone -> 1.0
        [("a", i, 10 * i) for i in range(1, 5)]
        # perfect reverse -> -1.0
        + [("b", i, -i) for i in range(1, 5)]
        # ties on both sides, hand-computed: doubled ranks rx=[3,3,6,8],
        # ry=[6,3,3,8] -> rho = (4*109-400)/(sqrt(72)*sqrt(72)) = 0.5
        + [("c", 1, 2), ("c", 1, 1), ("c", 2, 1), ("c", 3, 3)]
        # constant x -> undefined (NaN; SQL NULL)
        + [("d", 7, 1), ("d", 7, 2), ("d", 7, 3)]
    )
    got = _spearman(rows)
    assert got["a"] == (4, 1.0)
    assert got["b"] == (4, -1.0)
    assert got["c"] == (4, 0.5)
    assert got["d"][0] == 3 and math.isnan(got["d"][1])


def test_kappa_is_one_on_self_labeled_corpus():
    """Relabel a corpus with langid's own predictions: agreement is
    total, so kappa == 1.0 exactly (and the integer identity
    N*agree - chance == N*N - chance holds)."""
    sf = "/root/testdata/sf0.001"
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    pred = langid_batch(t).column("pred_lang")
    relabeled = t.append_column("lang", pred)
    out = langid_kappa(rd.from_arrow(relabeled)).to_pandas()
    assert out["kappa"].tolist() == [1.0]
    assert out["n_docs"].tolist() == [t.num_rows]


def test_queries_match_duckdb_sf0001():
    import duckdb

    from ocr_platform_ray.queries import (
        oracle_sql,
        q_langid_kappa,
        q_spearman_docs,
    )

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT *"
        f" FROM read_parquet('{sf}/documents.parquet')"
    )
    sp = (
        q_spearman_docs(sf).to_pandas().sort_values("lang").reset_index(drop=True)
    )
    want = (
        con.execute(oracle_sql()["q_spearman_docs"])
        .fetchdf()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    assert sp["lang"].tolist() == want["lang"].tolist()
    assert sp["n"].tolist() == want["n"].tolist()
    assert sp["spearman"].tolist() == want["spearman"].tolist()

    ka = q_langid_kappa(sf).to_pandas()
    want_k = con.execute(oracle_sql()["q_langid_kappa"]).fetchdf()
    assert ka["kappa"].tolist() == want_k["kappa"].tolist()
    assert ka["n_docs"].tolist() == want_k["n_docs"].tolist()


def test_langid_calibration_planted_bins():
    """Handcrafted stopword mixes pin the bin arithmetic: conf 1.0 ->
    bin 9, 0.5 -> bin 5, 1/3 (6dp 0.333333) -> bin 3, 0 -> bin 0; the
    zero-stopword doc predicts 'de' (tie falls through to the first
    CASE branch) and is the only miss."""
    from ocr_platform_ray.functions.textstats import langid_calibration

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "the and of to",  # en conf 1.0 -> bin 9, correct
                    "the la",         # en conf 0.5 -> bin 5, correct
                    "the la el",      # en conf 0.333333 -> bin 3, correct
                    "xyz qqq",        # no stopwords -> 'de' conf 0 -> bin 0
                ],
                pa.string(),
            ),
            "lang": pa.array(["en", "en", "en", "en"], pa.string()),
        }
    )
    out = (
        langid_calibration(rd.from_arrow(t))
        .to_pandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    assert out["bin"].tolist() == [0, 3, 5, 9]
    assert out["n"].tolist() == [1, 1, 1, 1]
    assert out["n_correct"].tolist() == [0, 1, 1, 1]
    assert out["accuracy"].tolist() == [0.0, 1.0, 1.0, 1.0]
    assert out["mean_conf"].tolist() == [0.0, 0.333333, 0.5, 1.0]
