"""Round-5 batch-8 operators pinned against brute-force references:
per-group OLS regression, day-over-day percent change, geometric means,
histogram quantile_cont, and the dup-cluster-size histogram."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

DAY_US = 86_400_000_000


class TestRegrByGroup:
    def test_matches_numpy_ols(self, ray_session):
        from ocr_platform_ray.functions.relational import regr_by_group

        rng = np.random.RandomState(3)
        n = 900
        df = pd.DataFrame(
            {
                "g": rng.choice(["a", "b"], n),
                "x": rng.rand(n) * 10,
                "y": None,
            }
        )
        df["y"] = 2.5 * df["x"] - 1.0 + rng.randn(n) * 0.1
        out = (
            regr_by_group(rd.from_pandas(df).repartition(9), "g", "x", "y")
            .to_pandas()
            .set_index("g")
        )
        for g, sub in df.groupby("g"):
            beta, icpt = np.polyfit(sub["x"], sub["y"], 1)
            r = np.corrcoef(sub["x"], sub["y"])[0, 1]
            assert out.loc[g, "slope"] == pytest.approx(beta, abs=1e-5)
            assert out.loc[g, "intercept"] == pytest.approx(icpt, abs=1e-5)
            assert out.loc[g, "r2"] == pytest.approx(r * r, abs=1e-5)

    def test_constant_x_is_nan(self, ray_session):
        from ocr_platform_ray.functions.relational import regr_by_group

        df = pd.DataFrame({"g": ["a"] * 20, "x": 3.0, "y": np.arange(20.0)})
        out = regr_by_group(rd.from_pandas(df), "g", "x", "y").to_pandas()
        assert np.isnan(out.loc[0, "slope"])


class TestDailyPctChange:
    def test_matches_bruteforce(self, ray_session):
        from ocr_platform_ray.functions.events import daily_counts_pct_change

        rng = np.random.RandomState(5)
        n = 1500
        df = pd.DataFrame(
            {
                "event_type": rng.choice(["v", "c"], n),
                "ts": pd.to_datetime(
                    rng.randint(0, 10 * DAY_US, n), unit="us"
                ).astype("datetime64[us]"),
            }
        )
        out = (
            daily_counts_pct_change(rd.from_pandas(df).repartition(7))
            .to_pandas()
            .set_index(["event_type", "day"])
        )
        d = df.copy()
        d["day_id"] = d["ts"].astype(np.int64) // DAY_US
        cnt = d.groupby(["event_type", "day_id"]).size().rename("n").reset_index()
        cnt = cnt.sort_values(["event_type", "day_id"])
        cnt["prev"] = cnt.groupby("event_type")["n"].shift()
        cnt = cnt[cnt["prev"].notna()]
        assert len(out) == len(cnt)
        for _, r in cnt.iterrows():
            day = str(
                np.int64(r["day_id"] * DAY_US).astype("datetime64[us]").astype(
                    "datetime64[D]"
                )
            )
            k = (r["event_type"], day)
            assert out.loc[k, "n"] == r["n"]
            assert out.loc[k, "pct_change"] == pytest.approx(
                (r["n"] - r["prev"]) / r["prev"], abs=1e-6
            )


class TestGeomean:
    def test_matches_bruteforce_and_drops_nonpositive(self, ray_session):
        from ocr_platform_ray.functions.sketches import geomean_by_group

        rng = np.random.RandomState(7)
        df = pd.DataFrame(
            {
                "lang": rng.choice(["en", "fr"], 400),
                "n_chars": rng.randint(-3, 500, 400).astype(np.int64),
            }
        )
        out = (
            geomean_by_group(
                rd.from_pandas(df).repartition(9), "lang", "n_chars"
            )
            .to_pandas()
            .set_index("lang")["geomean"]
        )
        for g, sub in df.groupby("lang"):
            v = sub.loc[sub["n_chars"] > 0, "n_chars"].to_numpy(np.float64)
            assert out[g] == pytest.approx(np.exp(np.log(v).mean()), abs=1e-5)


class TestGroupedHistQuantiles:
    def test_matches_quantile_cont(self, ray_session):
        from ocr_platform_ray.functions.sketches import grouped_hist_quantiles

        rng = np.random.RandomState(13)
        df = pd.DataFrame(
            {
                "g": rng.choice(["a", "b", "c"], 700),
                "v": rng.randint(0, 40, 700).astype(np.int64),
            }
        )
        out = (
            grouped_hist_quantiles(
                rd.from_pandas(df).repartition(9), "g", "v", qs=(0.5, 0.95)
            )
            .to_pandas()
            .set_index("g")
        )

        def qcont(x, q):
            x = np.sort(np.asarray(x, np.float64))
            pos = (len(x) - 1) * q
            lo = int(np.floor(pos))
            frac = pos - lo
            hi = min(lo + 1, len(x) - 1)
            return x[lo] * (1 - frac) + x[hi] * frac

        for g, sub in df.groupby("g"):
            assert out.loc[g, "q50"] == pytest.approx(
                qcont(sub["v"], 0.5), abs=1e-6
            )
            assert out.loc[g, "q95"] == pytest.approx(
                qcont(sub["v"], 0.95), abs=1e-6
            )

    def test_guard_fires(self, ray_session):
        from ocr_platform_ray.functions.sketches import grouped_hist_quantiles

        df = pd.DataFrame(
            {"g": ["a"] * 100, "v": np.arange(100, dtype=np.int64)}
        )
        with pytest.raises(ValueError, match="grouped_hist_quantiles"):
            grouped_hist_quantiles(
                rd.from_pandas(df).repartition(4), "g", "v", max_cells=10
            )


class TestDupClusterHistogram:
    def test_matches_bruteforce(self, ray_session):
        from ocr_platform_ray.functions.dedup import dup_cluster_histogram

        rng = np.random.RandomState(17)
        texts = [f"text body {i}" for i in rng.randint(0, 60, 200)]
        df = pd.DataFrame({"text": texts})
        out = (
            dup_cluster_histogram(rd.from_pandas(df).repartition(9))
            .to_pandas()
            .set_index("cluster_size")["n_clusters"]
        )
        sizes = pd.Series(texts).value_counts().value_counts()
        assert len(out) == len(sizes)
        for sz, n in sizes.items():
            assert out[sz] == n
        # conservation: sum(size * n_clusters) == corpus rows
        assert (out.index.to_numpy() * out.to_numpy()).sum() == len(df)


class TestShapeMoments:
    """shape_moments_by_group: DuckDB-bias-corrected skewness/kurtosis
    from mergeable centered power sums (q_value_shape exact oracle)."""

    def test_matches_scipy_style_reference(self, ray_session):
        import ray.data as rd
        from ocr_platform_ray.functions.relational import shape_moments_by_group

        rng = np.random.RandomState(7)
        n = 3000
        df = pd.DataFrame(
            {
                "g": rng.choice(["a", "b", "c"], n),
                # large offset + heavy tail: the regime the centered
                # power sums exist for
                "x": np.exp(rng.randn(n)) * 10 + 1e6,
            }
        )
        out = (
            shape_moments_by_group(rd.from_pandas(df).repartition(11), "g", "x")
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )

        def ref(d):
            x = d.to_numpy(float)
            nn, m = len(x), x.mean()
            e = x - m
            M2, M3, M4 = (e**2).sum(), (e**3).sum(), (e**4).sum()
            var = M2 / (nn - 1)
            g1 = nn / ((nn - 1) * (nn - 2)) * M3 / var**1.5
            g2 = (
                nn * (nn + 1) / ((nn - 1) * (nn - 2) * (nn - 3)) * M4 / var**2
                - 3 * (nn - 1) ** 2 / ((nn - 2) * (nn - 3))
            )
            return g1, g2

        for _, row in out.iterrows():
            g1, g2 = ref(df.loc[df.g == row["g"], "x"])
            assert abs(row["skew"] - g1) < 2e-6
            assert abs(row["kurt"] - g2) < 2e-6

    def test_partitioning_invariance(self, ray_session):
        import ray.data as rd
        from ocr_platform_ray.functions.relational import shape_moments_by_group

        rng = np.random.RandomState(3)
        df = pd.DataFrame(
            {"g": rng.choice(["u", "v"], 500), "x": rng.rand(500) * 9}
        )
        a = (
            shape_moments_by_group(rd.from_pandas(df).repartition(2), "g", "x")
            .to_pandas().sort_values("g").reset_index(drop=True)
        )
        b = (
            shape_moments_by_group(rd.from_pandas(df).repartition(17), "g", "x")
            .to_pandas().sort_values("g").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_null_contract_matches_duckdb(self, ray_session):
        import ray.data as rd
        from ocr_platform_ray.functions.relational import shape_moments_by_group

        df = pd.DataFrame(
            {
                "g": ["two"] * 2 + ["three"] * 3 + ["flat"] * 5,
                "x": [1.0, 2.0] + [1.0, 2.0, 4.0] + [5.0] * 5,
            }
        )
        out = shape_moments_by_group(rd.from_pandas(df), "g", "x").to_pandas()
        r = out.set_index("g")
        # n=2 -> both NULL; n=3 -> skew defined, kurt NULL; zero variance -> both NULL
        assert np.isnan(r.loc["two", "skew"]) and np.isnan(r.loc["two", "kurt"])
        assert not np.isnan(r.loc["three", "skew"])
        assert np.isnan(r.loc["three", "kurt"])
        assert np.isnan(r.loc["flat", "skew"]) and np.isnan(r.loc["flat", "kurt"])


class TestNtileByGroup:
    """ntile_by_group: DuckDB NTILE fill rule (first n%k tiles get one
    extra row), deterministic (v, id) total order, no global sort."""

    def test_matches_duckdb_ntile(self, ray_session):
        import duckdb
        import ray.data as rd
        from ocr_platform_ray.functions.relational import ntile_by_group

        rng = np.random.RandomState(11)
        df = pd.DataFrame(
            {
                "g": rng.choice(["a", "b", "c"], 700),
                "v": rng.randint(0, 40, 700),
                "id": np.arange(700),
            }
        )
        out = (
            ntile_by_group(rd.from_pandas(df).repartition(9), "g", "v", "id", k=5)
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        ref = duckdb.sql(
            "SELECT id, g, ntile(5) OVER (PARTITION BY g ORDER BY v, id)"
            " AS tile FROM df ORDER BY id"
        ).df()
        pd.testing.assert_frame_equal(
            out[["id", "g", "tile"]].astype({"tile": "int64"}),
            ref.astype({"tile": "int64"}),
        )

    def test_fewer_rows_than_tiles(self, ray_session):
        import ray.data as rd
        from ocr_platform_ray.functions.relational import ntile_by_group

        df = pd.DataFrame({"g": ["x"] * 3, "v": [9, 7, 8], "id": [1, 2, 3]})
        out = (
            ntile_by_group(rd.from_pandas(df), "g", "v", "id", k=10)
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        # rank order is by v: id2 (v=7) -> tile 1, id3 (v=8) -> 2,
        # id1 (v=9) -> 3
        assert out["tile"].tolist() == [3, 1, 2]

    def test_cell_guard_raises(self, ray_session):
        import ray.data as rd
        from ocr_platform_ray.functions.relational import ntile_by_group

        df = pd.DataFrame({"g": ["a"] * 50, "v": np.arange(50), "id": np.arange(50)})
        with pytest.raises(ValueError, match="cells"):
            ntile_by_group(
                rd.from_pandas(df), "g", "v", "id", k=4, max_cells=10
            ).to_pandas()
