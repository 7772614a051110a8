"""Round-5 batch-9 operators pinned against brute-force references:
JSON props extraction stats, KS two-sample drift, Mann-Whitney U, and
weighted median."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


class TestPropsFieldStats:
    def test_matches_bruteforce(self, ray_session):
        from ocr_platform_ray.functions.events import props_field_stats

        rng = np.random.RandomState(7)
        n = 400
        ks = rng.randint(-5, 120, n)
        et = rng.choice(["a", "b", "c"], n)
        df = pd.DataFrame(
            {"event_type": et, "props": [f'{{"k": {v}}}' for v in ks]}
        )
        out = (
            props_field_stats(rd.from_pandas(df).repartition(7))
            .to_pandas()
            .set_index("event_type")
        )
        ref = pd.DataFrame({"g": et, "k": ks}).groupby("g")["k"]
        for g in ["a", "b", "c"]:
            assert out.loc[g, "n"] == ref.size()[g]
            assert out.loc[g, "sum_k"] == ref.sum()[g]
            assert out.loc[g, "min_k"] == ref.min()[g]
            assert out.loc[g, "max_k"] == ref.max()[g]

    def test_missing_and_malformed_fields_drop(self, ray_session):
        from ocr_platform_ray.functions.events import props_field_stats

        df = pd.DataFrame(
            {
                "event_type": ["a", "a", "a", "b"],
                "props": ['{"k": 3}', '{"x": 1}', '{"k": "zz"}', "{}"],
            }
        )
        out = props_field_stats(rd.from_pandas(df)).to_pandas()
        assert out["event_type"].tolist() == ["a"]
        assert out["n"].tolist() == [1]
        assert out["sum_k"].tolist() == [3]


class TestKSBySource:
    def test_identical_distributions_zero(self, ray_session):
        from ocr_platform_ray.functions.textstats import ks_by_source

        # two sources with the SAME value multiset -> D == 0 exactly
        df = pd.DataFrame(
            {
                "source": ["s1"] * 6 + ["s2"] * 6,
                "n_chars": [1, 2, 2, 3, 3, 3] * 2,
            }
        )
        out = ks_by_source(rd.from_pandas(df).repartition(3)).to_pandas()
        assert out["ks_d"].tolist() == [0.0, 0.0]

    def test_matches_bruteforce_ecdf(self, ray_session):
        from ocr_platform_ray.functions.textstats import ks_by_source

        rng = np.random.RandomState(11)
        df = pd.DataFrame(
            {
                "source": rng.choice(["s1", "s2", "s3"], 500),
                "n_chars": rng.randint(0, 40, 500),
            }
        )
        out = (
            ks_by_source(rd.from_pandas(df).repartition(5))
            .to_pandas()
            .set_index("source")
        )
        vals = np.sort(df["n_chars"].unique())
        for g in ["s1", "s2", "s3"]:
            a = df.loc[df["source"] == g, "n_chars"].to_numpy()
            b = df.loc[df["source"] != g, "n_chars"].to_numpy()
            ecdf_a = np.searchsorted(np.sort(a), vals, side="right") / len(a)
            ecdf_b = np.searchsorted(np.sort(b), vals, side="right") / len(b)
            d = np.abs(ecdf_a - ecdf_b).max()
            assert out.loc[g, "ks_d"] == pytest.approx(d, abs=1e-6)

    def test_single_source_is_null(self, ray_session):
        from ocr_platform_ray.functions.textstats import ks_by_source

        df = pd.DataFrame({"source": ["s"] * 5, "n_chars": range(5)})
        out = ks_by_source(rd.from_pandas(df)).to_pandas()
        assert out["ks_d"].isna().all()


class TestMannWhitney:
    def test_matches_bruteforce_ranks(self, ray_session):
        from ocr_platform_ray.functions.relational import (
            mannwhitney_by_group,
        )

        rng = np.random.RandomState(5)
        df = pd.DataFrame(
            {
                "lang": rng.choice(["en", "fr"], 300),
                "n_chars": rng.randint(0, 25, 300),
            }
        )
        out = (
            mannwhitney_by_group(
                rd.from_pandas(df).repartition(4), "lang", "n_chars"
            )
            .to_pandas()
            .set_index("lang")
        )
        # brute force: tie-averaged ranks over the pooled sample
        ranks = pd.Series(df["n_chars"]).rank(method="average")
        for g in ["en", "fr"]:
            m = (df["lang"] == g).to_numpy()
            ng = int(m.sum())
            u = float(ranks[m].sum()) - ng * (ng + 1) / 2.0
            assert out.loc[g, "u_stat"] == pytest.approx(u, abs=1e-6)
            assert out.loc[g, "n"] == ng

    def test_disjoint_extremes(self, ray_session):
        from ocr_platform_ray.functions.relational import (
            mannwhitney_by_group,
        )

        # every "hi" value above every "lo" value: U_hi = n_hi * n_lo
        df = pd.DataFrame(
            {
                "lang": ["lo"] * 4 + ["hi"] * 3,
                "n_chars": [1, 2, 3, 4, 100, 101, 102],
            }
        )
        out = (
            mannwhitney_by_group(rd.from_pandas(df), "lang", "n_chars")
            .to_pandas()
            .set_index("lang")
        )
        assert out.loc["hi", "u_stat"] == 12.0
        assert out.loc["lo", "u_stat"] == 0.0


class TestWeightedMedian:
    def test_hand_example(self, ray_session):
        from ocr_platform_ray.functions.relational import (
            weighted_median_by_group,
        )

        # g: values 1,2,3 with weights 1,1,10 -> median 3
        # h: values 1,2 with weights 5,5 -> 2*cw(1)=10 >= tw=10 -> 1
        df = pd.DataFrame(
            {
                "g": ["g", "g", "g", "h", "h"],
                "v": [1.0, 2.0, 3.0, 1.0, 2.0],
                "w": [1, 1, 10, 5, 5],
            }
        )
        out = (
            weighted_median_by_group(
                rd.from_pandas(df).repartition(2), "g", "v", "w"
            )
            .to_pandas()
            .set_index("g")
        )
        assert out.loc["g", "wmedian"] == 3.0
        assert out.loc["h", "wmedian"] == 1.0

    def test_uniform_weights_equal_lower_median(self, ray_session):
        from ocr_platform_ray.functions.relational import (
            weighted_median_by_group,
        )

        rng = np.random.RandomState(2)
        v = rng.randint(0, 50, 101).astype(float)
        df = pd.DataFrame({"g": "a", "v": v, "w": 1})
        out = weighted_median_by_group(
            rd.from_pandas(df).repartition(3), "g", "v", "w"
        ).to_pandas()
        assert out.loc[0, "wmedian"] == float(np.sort(v)[50])
