"""Round-5 curation operators pinned against brute-force references:
token_budget_select (per-group running-sum cutoff in md5(id) order) and
word_entropy_batch (per-doc unigram Shannon entropy)."""

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


class TestTokenBudgetSelect:
    def _bruteforce(self, df, budget):
        df = df.copy()
        df["__sk"] = [
            hashlib.md5(str(d).encode()).hexdigest() for d in df["doc_id"]
        ]
        df = df.sort_values(["__sk", "doc_id"], kind="mergesort")
        keep = []
        for _, g in df.groupby("source", sort=False):
            run = 0
            for _, row in g.iterrows():
                run += row["n_tokens"]
                if run <= budget:
                    keep.append(row["doc_id"])
        return sorted(keep)

    def test_matches_bruteforce_across_partitionings(self, ray_session):
        from ocr_platform_ray.functions.dedup import token_budget_select

        rng = np.random.RandomState(7)
        df = pd.DataFrame(
            {
                "doc_id": np.arange(300, dtype=np.int64),
                "source": [f"s{i}" for i in rng.randint(0, 7, 300)],
                "n_tokens": rng.randint(0, 40, 300).astype(np.int64),
            }
        )
        expected = self._bruteforce(df, budget=150)
        # adversarial partitioning: many tiny blocks so the combiner's
        # local prefix-sum filter actually fires before the merge
        for nblocks in (1, 17):
            ds = rd.from_pandas(df).repartition(nblocks)
            out = token_budget_select(ds, group_col="source", budget=150)
            got = sorted(r["doc_id"] for r in out.take_all())
            assert got == expected, f"nblocks={nblocks}"

    def test_zero_weight_rows_survive_at_budget_edge(self, ray_session):
        from ocr_platform_ray.functions.dedup import token_budget_select

        df = pd.DataFrame(
            {
                "doc_id": np.arange(6, dtype=np.int64),
                "source": ["a"] * 6,
                "n_tokens": np.array([0, 0, 0, 0, 0, 0], dtype=np.int64),
            }
        )
        out = token_budget_select(
            rd.from_pandas(df).repartition(3), group_col="source", budget=0
        )
        assert out.count() == 6  # zero-weight rows never consume budget

    def test_negative_weights_raise(self, ray_session):
        import pytest

        from ocr_platform_ray.functions.dedup import token_budget_select

        df = pd.DataFrame(
            {"doc_id": [1], "source": ["a"], "n_tokens": [-1]}
        )
        out = token_budget_select(rd.from_pandas(df), "source", budget=10)
        with pytest.raises(Exception, match="negative weights"):
            out.take_all()


class TestWordEntropy:
    def _entropy(self, text):
        import re

        toks = re.findall("[a-z0-9]+", text)
        if not toks:
            return 0.0
        n = len(toks)
        counts = pd.Series(toks).value_counts()
        h = -sum((c / n) * math.log2(c / n) for c in counts)
        return math.floor((h + 0.0) * 1e6 + 0.5) / 1e6

    def test_planted_cases(self):
        from ocr_platform_ray.functions.textstats import word_entropy_batch

        texts = [
            "a a b b",          # uniform over 2 -> 1 bit
            "a a a a",          # single token -> 0.0 (not -0.0)
            "a b c d",          # uniform over 4 -> 2 bits
            "",                 # token-free -> 0.0
            "!!! ???",          # no [a-z0-9] tokens -> 0.0
            "a a a b",          # 3/4,1/4 -> 0.811278
        ]
        batch = pa.table({"doc_id": list(range(len(texts))), "text": texts})
        out = word_entropy_batch(batch)
        got = out.column("word_entropy").to_pylist()
        assert got == [1.0, 0.0, 2.0, 0.0, 0.0, 0.811278]
        # IEEE -0.0 must not leak into the hash
        assert all(math.copysign(1.0, v) > 0 for v in got)

    def test_matches_bruteforce_random(self):
        from ocr_platform_ray.functions.textstats import word_entropy_batch

        rng = np.random.RandomState(3)
        vocab = ["alpha", "beta", "gamma", "x1", "zz"]
        texts = [
            " ".join(rng.choice(vocab, rng.randint(0, 30)))
            for _ in range(200)
        ]
        batch = pa.table({"doc_id": list(range(200)), "text": texts})
        got = word_entropy_batch(batch).column("word_entropy").to_pylist()
        exp = [self._entropy(t) for t in texts]
        assert got == exp


class TestZscoreByGroup:
    def test_matches_bruteforce_across_partitionings(self, ray_session):
        from ocr_platform_ray.functions.relational import zscore_by_group

        rng = np.random.RandomState(5)
        df = pd.DataFrame(
            {
                "doc_id": np.arange(400, dtype=np.int64),
                "lang": [f"l{i}" for i in rng.randint(0, 5, 400)],
                "score": np.round(rng.rand(400), 6),
            }
        )

        def expected(df):
            out = {}
            for _, g in df.groupby("lang"):
                x = g["score"].to_numpy()
                n, s, ss = len(x), x.sum(), (x * x).sum()
                m = s / n
                sd = math.sqrt(max(ss / n - m * m, 0.0))
                for d, v in zip(g["doc_id"], x):
                    z = (v - m) / sd if sd > 0 else 0.0
                    out[d] = math.floor(abs(z) * 1e6 + 0.5) / 1e6 * (
                        1 if z >= 0 else -1
                    )
            return out

        exp = expected(df)
        for nblocks in (1, 13):
            ds = rd.from_pandas(df).repartition(nblocks)
            out = zscore_by_group(ds, "lang", "score")
            got = {r["doc_id"]: r["z"] for r in out.take_all()}
            assert got == exp, f"nblocks={nblocks}"

    def test_degenerate_groups_get_zero(self, ray_session):
        from ocr_platform_ray.functions.relational import zscore_by_group

        df = pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "lang": ["solo", "const", "const"],
                "score": [5.0, 2.0, 2.0],  # singleton + zero-variance
            }
        )
        out = zscore_by_group(rd.from_pandas(df), "lang", "score")
        assert all(r["z"] == 0.0 for r in out.take_all())


class TestBigramLogprob:
    def test_planted_model(self, ray_session):
        from ocr_platform_ray.functions.textstats import bigram_logprob

        # corpus: "a b" x2 and "a b c" -> bigrams: (a,b):3, (b,c):1
        # V = 3 distinct unigrams; c1(a)=3, c1(b)=1
        df = pd.DataFrame(
            {"doc_id": [0, 1, 2, 3], "text": ["a b", "a b", "a b c", "x"]}
        )
        out = {r["doc_id"]: r for r in
               bigram_logprob(rd.from_pandas(df)).take_all()}
        # V counts 'x' too -> V=4
        lp_ab = math.log((3 + 1) / (3 + 4))
        lp_bc = math.log((1 + 1) / (1 + 4))
        r6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6
        assert 3 not in out  # single-token doc: no bigrams
        assert out[0]["mean_logprob"] == r6(lp_ab)
        assert out[0]["n_bigrams"] == 1
        assert out[2]["mean_logprob"] == r6((lp_ab + lp_bc) / 2)
        assert out[2]["n_bigrams"] == 2

    def test_partitioning_invariance(self, ray_session):
        from ocr_platform_ray.functions.textstats import bigram_logprob

        rng = np.random.RandomState(13)
        vocab = ["aa", "bb", "cc", "dd"]
        df = pd.DataFrame(
            {
                "doc_id": np.arange(120, dtype=np.int64),
                "text": [
                    " ".join(rng.choice(vocab, rng.randint(0, 12)))
                    for _ in range(120)
                ],
            }
        )
        base = None
        for nblocks in (1, 11):
            ds = rd.from_pandas(df).repartition(nblocks)
            got = sorted(
                (r["doc_id"], r["mean_logprob"], r["n_bigrams"])
                for r in bigram_logprob(ds).take_all()
            )
            if base is None:
                base = got
            else:
                assert got == base

    def test_training_corpus_exact_math(self, ray_session):
        from ocr_platform_ray.functions.textstats import bigram_logprob

        train = pd.DataFrame({"doc_id": [0], "text": "a b a b"})
        out = {r["doc_id"]: r for r in
               bigram_logprob(rd.from_pandas(train)).take_all()}
        # V=2, bigrams (a,b):2 (b,a):1, c1(a)=2, c1(b)=1
        assert out[0]["n_bigrams"] == 3
        r6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6
        lp_ab = math.log((2 + 1) / (2 + 2))
        lp_ba = math.log((1 + 1) / (1 + 2))
        assert out[0]["mean_logprob"] == r6((2 * lp_ab + lp_ba) / 3)

    def test_oov_scoring_on_held_out_text(self, ray_session):
        """Held-out scoring via score_ds, where the smoothing fallbacks
        actually fire (the oracle never exercises them: it scores the
        training corpus itself). Train on 'a b a b': V=2, c1(a)=2.
        Held-out 'a z' = seen context a + unseen pair -> ln(1/(2+2));
        'z q' = unseen context -> ln(1/2)."""
        from ocr_platform_ray.functions.textstats import bigram_logprob

        train = rd.from_pandas(
            pd.DataFrame({"doc_id": [0], "text": "a b a b"})
        )
        held = rd.from_pandas(
            pd.DataFrame({"doc_id": [10, 11], "text": ["a z", "z q"]})
        )
        out = {r["doc_id"]: r for r in
               bigram_logprob(train, score_ds=held).take_all()}
        r6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6
        assert out[10]["mean_logprob"] == r6(math.log(1 / 4))
        assert out[11]["mean_logprob"] == r6(math.log(1 / 2))
        assert out[10]["n_bigrams"] == out[11]["n_bigrams"] == 1

    def test_max_vocab_guard_is_loud(self, ray_session):
        import pytest

        from ocr_platform_ray.functions.textstats import bigram_logprob

        df = pd.DataFrame(
            {"doc_id": [0], "text": "a b c d e f g h"}
        )
        with pytest.raises(ValueError, match="max_vocab"):
            bigram_logprob(rd.from_pandas(df), max_vocab=3).take_all()
