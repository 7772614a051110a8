"""Planted pins for round-5 batch 23: KMV set-overlap sketches, HHI
revenue concentration, cume_dist window, and k-fold balance audit.
Registry equality vs DuckDB at sf0.01/sf0.1 is swept by
tools/check_correctness.py."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.dedup import kfold_summary
from ocr_platform_ray.functions.relational import cume_dist_by_group
from ocr_platform_ray.functions.sketches import kmv_set_overlap
from ocr_platform_ray.md5np import md5_u32


def test_kmv_exact_when_small():
    """Both sketches complete (< k distinct) -> every estimate is the
    EXACT count over the 32-bit hash sets, and those hashes are
    collision-free here, so it's the exact set math."""
    users_a = [f"u{i}" for i in range(40)]
    users_b = [f"u{i}" for i in range(20, 70)]  # overlap = 20
    t = pa.table(
        {
            "event_type": pa.array(
                ["A"] * len(users_a) + ["B"] * len(users_b)
            ),
            "user_id": pa.array(users_a + users_b),
        }
    )
    out = kmv_set_overlap(
        rd.from_arrow(t), key="event_type", value="user_id", k=256
    ).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["type_a"], r["type_b"]) == ("A", "B")
    assert r["est_a"] == 40.0 and r["est_b"] == 50.0
    assert r["est_union"] == 70.0 and r["est_intersect"] == 20.0
    assert r["jaccard_est"] == round(20.0 / 70.0, 6)


def test_kmv_duplicates_collapse():
    """Distinct semantics: repeated (key, value) rows don't change
    anything."""
    t = pa.table(
        {
            "event_type": pa.array(["A"] * 6 + ["B"] * 6),
            "user_id": pa.array(["x", "y", "z"] * 2 + ["y", "z", "w"] * 2),
        }
    )
    out = kmv_set_overlap(
        rd.from_arrow(t), key="event_type", value="user_id", k=256
    ).to_pandas()
    r = out.iloc[0]
    assert r["est_a"] == 3.0 and r["est_b"] == 3.0
    assert r["est_union"] == 4.0 and r["est_intersect"] == 2.0


def test_kmv_estimator_accuracy_large():
    """Above k distinct the (k-1)*2^32/h_k estimator should land within
    ~3/sqrt(k) of truth (k=256 -> ~19%); use 12% as a generous planted
    bound for this seed."""
    users = [f"user{i}" for i in range(5000)]
    t = pa.table(
        {
            "event_type": pa.array(["A"] * len(users)),
            "user_id": pa.array(users),
        }
    )
    # single key -> no pairs; check via two overlapping keys
    t2 = pa.table(
        {
            "event_type": pa.array(["A"] * 5000 + ["B"] * 5000),
            "user_id": pa.array(users + [f"user{i}" for i in range(2500, 7500)]),
        }
    )
    out = kmv_set_overlap(
        rd.from_arrow(t2), key="event_type", value="user_id", k=256
    ).to_pandas()
    r = out.iloc[0]
    assert abs(r["est_a"] - 5000) / 5000 < 0.12
    assert abs(r["est_b"] - 5000) / 5000 < 0.12
    assert abs(r["est_union"] - 7500) / 7500 < 0.12
    # jaccard truth = 2500/7500
    assert abs(r["jaccard_est"] - 1 / 3) < 0.12


def test_cume_dist_planted():
    t = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c", "d", "e"]),
            "lang": pa.array(["en"] * 4 + ["fr"]),
            "n_chars": pa.array([10, 20, 20, 40, 7], pa.int64()),
        }
    )
    out = (
        cume_dist_by_group(rd.from_arrow(t), "lang", "n_chars")
        .to_pandas()
        .set_index("doc_id")["cd"]
    )
    # en: 10 -> 1/4; 20,20 -> 3/4 (max-rank ties); 40 -> 1
    assert out["a"] == 0.25
    assert out["b"] == 0.75 and out["c"] == 0.75
    assert out["d"] == 1.0
    assert out["e"] == 1.0  # singleton group


def test_kfold_matches_brute():
    n = 400
    doc_ids = [f"doc{i:04d}" for i in range(n)]
    langs = [["en", "fr", "de"][i % 3] for i in range(n)]
    chars = [(i * 37) % 900 + 10 for i in range(n)]
    t = pa.table(
        {
            "doc_id": pa.array(doc_ids),
            "lang": pa.array(langs),
            "n_chars": pa.array(chars, pa.int64()),
        }
    )
    out = kfold_summary(rd.from_arrow(t), n_folds=5).to_pandas()
    fold = (
        md5_u32(pa.array(doc_ids)) % np.uint32(5)
    ).astype(np.int64)
    brute = (
        pd.DataFrame({"fold": fold, "lang": langs, "n_chars": chars})
        .groupby("fold")
        .agg(
            n_docs=("lang", "size"),
            sum_chars=("n_chars", "sum"),
            n_langs=("lang", "nunique"),
        )
        .reset_index()
    )
    assert out["fold"].tolist() == brute["fold"].tolist()
    assert out["n_docs"].tolist() == brute["n_docs"].tolist()
    assert out["sum_chars"].tolist() == brute["sum_chars"].tolist()
    assert out["n_langs"].tolist() == brute["n_langs"].tolist()
    assert int(out["n_docs"].sum()) == n
    for _, r in out.iterrows():
        assert r["mean_chars"] == round(r["sum_chars"] / r["n_docs"], 6)
