"""Round-5 batch-7 operators pinned against brute-force references:
winsorized group means, vocabulary-overlap Jaccard, systematic sampling
on the md5 contract, and the chi-square source-balance audit."""

import hashlib

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


class TestWinsorizedMean:
    def test_matches_bruteforce(self, ray_session):
        from ocr_platform_ray.functions.sketches import winsorized_mean_by_group

        rng = np.random.RandomState(3)
        n = 900
        df = pd.DataFrame(
            {
                "event_type": rng.choice(["a", "b", "c"], n),
                "value": np.concatenate(
                    [rng.rand(n - 10), rng.rand(10) * 1000]  # planted outliers
                ),
            }
        )
        out = (
            winsorized_mean_by_group(
                rd.from_pandas(df).repartition(9), "event_type", "value"
            )
            .to_pandas()
            .set_index("event_type")["wmean"]
        )

        def qcont(x, q):  # DuckDB quantile_cont weighted form
            x = np.sort(np.asarray(x, np.float64))
            pos = (len(x) - 1) * q
            lo = int(np.floor(pos))
            frac = pos - lo
            hi = min(lo + 1, len(x) - 1)
            return x[lo] * (1 - frac) + x[hi] * frac

        for g, sub in df.groupby("event_type"):
            v = sub["value"].to_numpy()
            lo, hi = qcont(v, 0.05), qcont(v, 0.95)
            want = np.clip(v, lo, hi).mean()
            assert out[g] == pytest.approx(want, abs=1e-6)
            # the winsorized mean must resist the planted outliers
            assert out[g] < v.mean() or (v <= hi).all()


class TestVocabOverlap:
    def test_matches_bruteforce(self, ray_session):
        from ocr_platform_ray.functions.textstats import vocab_overlap_by_source

        rng = np.random.RandomState(11)
        vocab = [f"w{i}" for i in range(60)]
        rows = []
        for s, base in [("a", 0), ("b", 20), ("c", 40)]:
            for _ in range(40):
                words = rng.choice(vocab[base : base + 40], 8)
                rows.append((s, " ".join(words)))
        df = pd.DataFrame(rows, columns=["source", "text"])
        out = (
            vocab_overlap_by_source(rd.from_pandas(df).repartition(7))
            .to_pandas()
            .set_index(["src_a", "src_b"])["jaccard"]
        )
        sets = {
            s: set(t for txt in sub["text"] for t in txt.split())
            for s, sub in df.groupby("source")
        }
        for a in "abc":
            for b in "abc":
                if a >= b:
                    continue
                inter = len(sets[a] & sets[b])
                if inter == 0:
                    assert (a, b) not in out.index
                    continue
                want = inter / len(sets[a] | sets[b])
                assert out[(a, b)] == pytest.approx(want, abs=1e-6)


class TestSystematicSample:
    def test_matches_md5_contract(self, ray_session):
        from ocr_platform_ray.functions.dedup import systematic_sample

        ids = np.arange(500, dtype=np.int64)
        df = pd.DataFrame({"doc_id": ids})
        out = sorted(
            systematic_sample(
                rd.from_pandas(df).repartition(9), every=50
            ).to_pandas()["doc_id"]
        )
        order = sorted(
            ids, key=lambda i: (hashlib.md5(f"{i}:7".encode()).hexdigest(), i)
        )
        want = sorted(order[::50])
        assert out == want
        assert len(out) == 10


class TestSourceBalanceChi2:
    def test_uniform_mix_is_zero(self, ray_session):
        from ocr_platform_ray.functions.sketches import source_balance_chi2

        # identical lang mix in every source -> chi2 == 0 exactly
        df = pd.DataFrame(
            {
                "source": ["a"] * 40 + ["b"] * 40,
                "lang": (["en"] * 30 + ["fr"] * 10) * 2,
            }
        )
        out = source_balance_chi2(rd.from_pandas(df).repartition(5)).to_pandas()
        assert (out["chi2"] == 0.0).all()

    def test_matches_bruteforce(self, ray_session):
        from ocr_platform_ray.functions.sketches import source_balance_chi2

        rng = np.random.RandomState(23)
        df = pd.DataFrame(
            {
                "source": rng.choice(["a", "b", "c"], 600),
                "lang": rng.choice(["en", "fr", "zh"], 600),
            }
        )
        out = (
            source_balance_chi2(rd.from_pandas(df).repartition(9))
            .to_pandas()
            .set_index("source")["chi2"]
        )
        c = df.groupby(["source", "lang"]).size().unstack(fill_value=0)
        ns, nl, N = c.sum(axis=1), c.sum(axis=0), len(df)
        for g in c.index:
            chi = sum(
                (c.loc[g, l] - ns[g] * nl[l] / N) ** 2 / (ns[g] * nl[l] / N)
                for l in sorted(c.columns)
            )
            assert out[g] == pytest.approx(chi, abs=1e-6)
