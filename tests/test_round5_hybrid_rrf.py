"""Reciprocal-rank fusion of BM25 and cosine retrieval."""

import math

import numpy as np
import pandas as pd

import ray.data as rd


def _emb(vecs):
    return rd.from_pandas(
        pd.DataFrame(
            {
                "vec_id": np.arange(len(vecs), dtype=np.int64),
                "embedding": [list(map(float, v)) for v in vecs],
            }
        )
    )


class TestHybridRrf:
    def test_both_lists_beat_single_list(self, ray_session):
        from ocr_platform_ray.functions.similarity import hybrid_rrf

        # doc 0: keyword hit AND near the query vector (wins)
        # doc 1: keyword-only; doc 2: vector-only; doc 3: neither
        docs = pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    "merge scan",
                    "merge merge scan scan",
                    "nothing relevant here",
                    "also nothing",
                ],
            }
        )
        vecs = [[1, 0], [0, -1], [0.9, 0.1], [0, 1]]
        out = hybrid_rrf(
            rd.from_pandas(docs), _emb(vecs), ["merge", "scan"],
            [1.0, 0.0], k=4, pool=2,
        ).to_pandas().set_index("doc_id")
        assert out.loc[0, "rrf_score"] == out["rrf_score"].max()
        assert out.loc[0, "bm25_rank"] > 0 and out.loc[0, "cos_rank"] > 0
        assert out.loc[1, "cos_rank"] == 0  # keyword-only
        assert out.loc[2, "bm25_rank"] == 0  # vector-only
        assert 3 not in out.index  # in neither pool-2 list

    def test_rrf_math(self, ray_session):
        from ocr_platform_ray.functions.similarity import hybrid_rrf

        docs = pd.DataFrame({"doc_id": [0, 1], "text": ["merge", "merge merge"]})
        vecs = [[1, 0], [0, 1]]
        out = hybrid_rrf(
            rd.from_pandas(docs), _emb(vecs), ["merge"], [1.0, 0.0],
            k=2, pool=2,
        ).to_pandas().set_index("doc_id")
        r6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6
        # doc 1 ranks 1st on bm25 (higher tf); doc 0 ranks 1st on cosine
        assert out.loc[1, "rrf_score"] == r6(1 / 61 + 1 / 62)
        assert out.loc[0, "rrf_score"] == r6(1 / 62 + 1 / 61)

    def test_partitioning_invariance(self, ray_session):
        from ocr_platform_ray.functions.similarity import hybrid_rrf

        rng = np.random.RandomState(3)
        docs = pd.DataFrame(
            {
                "doc_id": np.arange(60, dtype=np.int64),
                "text": [
                    " ".join(rng.choice(["merge", "scan", "x", "y"], 6))
                    for _ in range(60)
                ],
            }
        )
        vecs = rng.randn(60, 4)
        base = None
        for nblocks in (1, 9):
            got = hybrid_rrf(
                rd.from_pandas(docs).repartition(nblocks),
                _emb(vecs).repartition(nblocks),
                ["merge", "scan"],
                list(vecs[0]),
                k=10,
            ).to_pandas()
            if base is None:
                base = got
            else:
                pd.testing.assert_frame_equal(got, base)
