"""Bloom-gated incremental dedup pinned against a brute-force anti-join:
exactness under planted duplicates, exactness under a deliberately
saturated (tiny) bitmap where EVERY row is a Bloom candidate, and the
empty-seen / empty-new edges."""

import numpy as np
import pandas as pd

import ray.data as rd

from ocr_platform_ray.functions.dedup import (
    _bloom_positions,
    bloom_novel_docs,
)


def _brute_novel(new: pd.DataFrame, seen: pd.DataFrame) -> set:
    return set(new.loc[~new["text"].isin(set(seen["text"])), "doc_id"])


def _corpus(n_seen=400, n_new=200, overlap=60, seed=11):
    rng = np.random.RandomState(seed)
    words = ["scan", "merge", "sort", "hash", "join", "agg", "row", "col"]

    def text(i):
        k = rng.randint(3, 12)
        return " ".join(rng.choice(words, k)) + f" #{i}"

    seen = pd.DataFrame(
        {"doc_id": np.arange(n_seen), "text": [text(i) for i in range(n_seen)]}
    )
    new_texts = [text(10_000 + i) for i in range(n_new - overlap)] + list(
        rng.choice(seen["text"], overlap, replace=False)
    )
    rng.shuffle(new_texts)
    new = pd.DataFrame(
        {"doc_id": np.arange(50_000, 50_000 + n_new), "text": new_texts}
    )
    return new, seen


class TestBloomNovel:
    def test_exact_vs_brute_force(self, ray_session):
        new, seen = _corpus()
        got = bloom_novel_docs(
            rd.from_pandas(new).repartition(7),
            rd.from_pandas(seen).repartition(9),
        ).to_pandas()
        assert set(got["doc_id"]) == _brute_novel(new, seen)

    def test_saturated_bitmap_still_exact(self, ray_session):
        # m so small every row collides: the prefilter prunes NOTHING and
        # the verify pass alone must deliver exactness (pure-FP regime)
        new, seen = _corpus(seed=23)
        got = bloom_novel_docs(
            rd.from_pandas(new).repartition(5),
            rd.from_pandas(seen).repartition(5),
            m_bits=64,
            n_probes=2,
        ).to_pandas()
        assert set(got["doc_id"]) == _brute_novel(new, seen)

    def test_candidate_cap_is_loud(self, ray_session):
        new, seen = _corpus(seed=5)
        try:
            bloom_novel_docs(
                rd.from_pandas(new),
                rd.from_pandas(seen),
                m_bits=64,
                n_probes=1,
                max_candidates=3,
            )
        except ValueError as e:
            assert "max_candidates" in str(e)
        else:
            raise AssertionError("expected the loud candidate-cap error")

    def test_empty_seen_everything_novel(self, ray_session):
        new, seen = _corpus(n_seen=4, n_new=30, overlap=0)
        got = bloom_novel_docs(
            rd.from_pandas(new),
            rd.from_pandas(seen.iloc[:0]),
        ).to_pandas()
        assert set(got["doc_id"]) == set(new["doc_id"])

    def test_positions_deterministic_and_in_range(self):
        import pyarrow as pa

        texts = pa.array(["alpha", "beta", "gamma", "alpha"])
        m = 1 << 16
        p1 = _bloom_positions(texts, m, 7)
        p2 = _bloom_positions(texts, m, 7)
        assert (p1 == p2).all()
        assert (p1 < m).all()
        assert (p1[0] == p1[3]).all()  # same text -> same probes
        # double hashing: distinct probe positions for a healthy m
        assert len(np.unique(p1[0])) == 7


class TestNovelSharded:
    def test_equals_bloom_path_and_brute_force(self, ray_session):
        from ocr_platform_ray.functions.dedup import novel_docs_sharded

        new, seen = _corpus(seed=31)
        sharded = novel_docs_sharded(
            rd.from_pandas(new).repartition(7),
            rd.from_pandas(seen).repartition(9),
            n_shards=4,
        ).to_pandas()
        bloom = bloom_novel_docs(
            rd.from_pandas(new).repartition(7),
            rd.from_pandas(seen).repartition(9),
        ).to_pandas()
        want = _brute_novel(new, seen)
        assert set(sharded["doc_id"]) == want
        assert set(bloom["doc_id"]) == want

    def test_empty_seen(self, ray_session):
        from ocr_platform_ray.functions.dedup import novel_docs_sharded

        new, seen = _corpus(n_seen=4, n_new=20, overlap=0)
        got = novel_docs_sharded(
            rd.from_pandas(new), rd.from_pandas(seen.iloc[:0]), n_shards=2
        ).to_pandas()
        assert set(got["doc_id"]) == set(new["doc_id"])


class TestExactQuantilesShared:
    def test_multi_equals_scalar_bitwise(self, ray_session):
        from ocr_platform_ray.functions.sketches import (
            exact_quantile,
            exact_quantiles,
        )

        rng = np.random.RandomState(7)
        v = np.round(rng.lognormal(0, 1.3, 4000), 6)
        ds = rd.from_pandas(pd.DataFrame({"x": v})).repartition(11)
        qs = [0.0, 1.0 / 3.0, 0.5, 2.0 / 3.0, 0.9, 1.0]
        for interp in ("numpy", "duckdb"):
            multi = exact_quantiles(ds, "x", qs, interpolation=interp)
            for q, got in zip(qs, multi):
                assert got == exact_quantile(ds, "x", q, interpolation=interp)
        # and against numpy directly for the pinned form
        for q, got in zip(qs, exact_quantiles(ds, "x", qs)):
            assert got == float(np.quantile(v, q))
