"""Round-4 scale-path additions: sharded decontamination (no eval-side
cap), blocked-BLAS SemDeDup prune, distributed k-means partial merge,
auto n_clusters rule."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from ocr_platform_ray.functions import dedup, similarity
from ocr_platform_ray.functions.similarity import _greedy_prune_rows


def _text_corpus(n_docs=300, seed=7, n_parts=5):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(50)]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(5, 30)).tolist())
        for _ in range(n_docs)
    ]
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n_docs), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(n_parts)


def _flags(ds):
    return sorted((r["doc_id"], r["n_overlap"]) for r in ds.take_all())


class TestShardedDecontam:
    def test_equals_broadcast_path(self, ray_session):
        ds = _text_corpus()
        broadcast = _flags(dedup.decontaminate_against_eval(ds))
        sharded = _flags(dedup.decontaminate_against_eval_sharded(ds, n_shards=4))
        assert broadcast == sharded
        assert len(broadcast) > 0  # the corpus genuinely overlaps

    def test_completes_beyond_broadcast_cap(self, ray_session):
        """An eval side over max_eval_ngrams makes the broadcast variant
        refuse; the sharded variant completes with identical flags."""
        ds = _text_corpus(n_docs=120, seed=11, n_parts=3)
        with pytest.raises(ValueError, match="max_eval_ngrams"):
            dedup.decontaminate_against_eval(ds, max_eval_ngrams=3).take_all()
        want = _flags(dedup.decontaminate_against_eval(ds))  # default cap
        got = _flags(dedup.decontaminate_against_eval_sharded(ds, n_shards=3))
        assert got == want

    def test_shard_count_invariance(self, ray_session):
        ds = _text_corpus(n_docs=150, seed=3, n_parts=4)
        one = _flags(dedup.decontaminate_against_eval_sharded(ds, n_shards=1))
        many = _flags(dedup.decontaminate_against_eval_sharded(ds, n_shards=7))
        assert one == many


def _ref_greedy(nm, tau):
    """The pre-round-4 row-at-a-time greedy loop (reference semantics)."""
    kept = []
    for i in range(len(nm)):
        if not kept:
            kept.append(i)
            continue
        if float((nm[kept] @ nm[i]).max()) < tau:
            kept.append(i)
    return kept


class TestGreedyPruneBlocked:
    @pytest.mark.parametrize("seed,n,d,tau,block", [
        (0, 1, 4, 0.9, 2048),
        (1, 37, 8, 0.95, 16),   # block smaller than n: many boundaries
        (2, 500, 16, 0.9, 128),
        (3, 300, 8, 0.99, 64),
        (4, 200, 8, -1.0, 64),  # tau below every cosine: keep only row 0
    ])
    def test_equals_sequential_greedy(self, seed, n, d, tau, block):
        rng = np.random.default_rng(seed)
        base = rng.normal(size=(max(n // 2, 1), d))
        emb = np.concatenate([base, base + rng.normal(size=base.shape) * 0.01])[:n]
        nm = emb / np.maximum(np.linalg.norm(emb, axis=1), 1e-30)[:, None]
        assert _greedy_prune_rows(nm, tau, block=block).tolist() == _ref_greedy(nm, tau)

    def test_empty(self):
        assert _greedy_prune_rows(np.zeros((0, 4)), 0.9).tolist() == []

    def test_all_identical_keeps_first(self):
        nm = np.tile(np.array([[1.0, 0.0]]), (50, 1))
        assert _greedy_prune_rows(nm, 0.95, block=8).tolist() == [0]


def _emb_ds(n=400, dim=16, seed=5, n_parts=4):
    rng = np.random.default_rng(seed)
    emb = rng.normal(size=(n, dim))
    emb[n // 2:] = emb[: n // 2] + rng.normal(size=(n - n // 2, dim)) * 0.01
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array([list(map(float, e)) for e in emb]),
            }
        )
    ).repartition(n_parts)


class TestKmeansDistributedMerge:
    def test_bit_identical_to_driver_merge(self, ray_session):
        ds = _emb_ds()
        base = {
            r["vec_id"]: (r["cluster"], r["cos_to_centroid"])
            for r in similarity.kmeans_clusters(ds, n_clusters=8).take_all()
        }
        dist = {
            r["vec_id"]: (r["cluster"], r["cos_to_centroid"])
            for r in similarity.kmeans_clusters(
                ds, n_clusters=8, driver_merge_max=0
            ).take_all()
        }
        assert base == dist


class TestSemanticDedupAuto:
    def test_auto_k_matches_explicit_small_corpus(self, ray_session):
        """The K-from-corpus-size rule keeps K=8 below ~200k rows, so
        small-sf behavior (and the q_semantic_dedup golden) is unchanged."""
        ds = _emb_ds(n=300, seed=9)
        auto = sorted(r["vec_id"] for r in
                      similarity.semantic_dedup_keep(ds, tau=0.94).take_all())
        explicit = sorted(r["vec_id"] for r in
                          similarity.semantic_dedup_keep(
                              ds, n_clusters=8, tau=0.94).take_all())
        assert auto == explicit
        assert 0 < len(auto) < 300  # pruning genuinely happened
