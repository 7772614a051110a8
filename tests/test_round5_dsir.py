"""DSIR hashed-n-gram importance scoring (Xie et al. 2023)."""

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


def _brute_dsir(corpus, target, m=64):
    """Single-process reference: identical formula, hashlib md5."""
    import re

    def grams(text):
        toks = re.findall(r"[a-z0-9]+", text)
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % m

    def counts(texts):
        out = np.zeros(m)
        for t in texts:
            for g in grams(t):
                out[bucket(g)] += 1
        return out

    tc, cc = counts(target["text"]), counts(corpus["text"])
    lr = np.log((tc + 1) / (tc.sum() + m)) - np.log((cc + 1) / (cc.sum() + m))
    rows = {}
    for d, t in zip(corpus["doc_id"], corpus["text"]):
        gs = grams(t)
        if gs:
            s = sum(lr[bucket(g)] for g in gs)
            rows[d] = (math.floor(s * 1e6 + 0.5) / 1e6, len(gs))
    return rows


class TestDsirScores:
    def test_matches_brute_force(self, ray_session):
        from ocr_platform_ray.functions.textstats import dsir_scores

        rng = np.random.RandomState(11)
        vocab = ["alpha", "beta", "gamma", "delta", "x9"]
        corpus = pd.DataFrame(
            {
                "doc_id": np.arange(80, dtype=np.int64),
                "text": [
                    " ".join(rng.choice(vocab, rng.randint(0, 10)))
                    for _ in range(80)
                ],
            }
        )
        target = corpus.iloc[:20]
        got = {
            r["doc_id"]: (r["dsir_score"], r["n_grams"])
            for r in dsir_scores(
                rd.from_pandas(corpus).repartition(7),
                rd.from_pandas(target).repartition(3),
                n_buckets=64,
            ).take_all()
        }
        assert got == _brute_dsir(corpus, target, m=64)

    def test_target_like_docs_score_higher(self, ray_session):
        from ocr_platform_ray.functions.textstats import dsir_scores

        corpus = pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    "physics quantum energy",
                    "physics quantum energy",
                    "recipe sugar butter",
                    "recipe sugar butter",
                ],
            }
        )
        target = pd.DataFrame(
            {"doc_id": [100], "text": ["physics quantum energy physics"]}
        )
        got = {
            r["doc_id"]: r["dsir_score"]
            for r in dsir_scores(
                rd.from_pandas(corpus), rd.from_pandas(target)
            ).take_all()
        }
        assert got[0] > got[2]
        assert got[0] == got[1] and got[2] == got[3]

    def test_empty_docs_absent(self, ray_session):
        from ocr_platform_ray.functions.textstats import dsir_scores

        corpus = pd.DataFrame({"doc_id": [0, 1], "text": ["a b", ""]})
        out = dsir_scores(
            rd.from_pandas(corpus), rd.from_pandas(corpus)
        ).take_all()
        assert [r["doc_id"] for r in out] == [0]
        # unigram a, unigram b, bigram 'a b'
        assert out[0]["n_grams"] == 3
