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
