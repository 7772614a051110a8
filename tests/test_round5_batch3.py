"""Round-5 batch-3 operators pinned against brute-force pandas
references on adversarial partitionings: pivot_counts (SQL PIVOT
crosstab), compact_latest (CDC latest-record compaction), and
gini_by_group (exact rank-form Gini from histogram partials)."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


def _docs(n=400, seed=3):
    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "lang": rng.choice(["en", "fr", "zh"], n),
            "source": rng.choice([f"s{i}" for i in range(7)], n),
            "n_chars": rng.randint(1, 50, n).astype(np.int64),
        }
    )


class TestPivotCounts:
    def test_matches_bruteforce(self, ray_session):
        from ocr_platform_ray.functions.relational import pivot_counts

        df = _docs()
        out = (
            pivot_counts(
                rd.from_pandas(df).repartition(9),
                "source",
                "lang",
                values=["en", "fr", "zh"],
            )
            .to_pandas()
            .reset_index(drop=True)
        )
        ref = (
            df.pivot_table(
                index="source",
                columns="lang",
                values="doc_id",
                aggfunc="size",
                fill_value=0,
            )[["en", "fr", "zh"]]
            .astype(np.int64)
            .reset_index()
        )
        ref.columns = ["source", "n_en", "n_fr", "n_zh"]
        ref = ref.sort_values("source").reset_index(drop=True)
        pd.testing.assert_frame_equal(out, ref)

    def test_unlisted_values_dropped_and_missing_zero_filled(
        self, ray_session
    ):
        from ocr_platform_ray.functions.relational import pivot_counts

        df = _docs()
        out = pivot_counts(
            rd.from_pandas(df),
            "source",
            "lang",
            values=["en", "never_seen"],
        ).to_pandas()
        assert list(out.columns) == ["source", "n_en", "n_never_seen"]
        assert (out["n_never_seen"] == 0).all()
        # 'fr'/'zh' rows are ignored, like sum(CASE WHEN ...)
        assert out["n_en"].sum() == (df["lang"] == "en").sum()

    def test_max_rows_guard_fires(self, ray_session):
        from ocr_platform_ray.functions.relational import pivot_counts

        df = _docs()
        df["source"] = [f"u{i}" for i in range(len(df))]  # every row a key
        with pytest.raises(ValueError, match="pivot_counts"):
            pivot_counts(
                rd.from_pandas(df).repartition(8),
                "source",
                "lang",
                values=["en"],
                max_rows=50,
            ).materialize()


class TestCompactLatest:
    def test_matches_bruteforce(self, ray_session):
        from ocr_platform_ray.functions.events import compact_latest

        rng = np.random.RandomState(11)
        n = 600
        df = pd.DataFrame(
            {
                "event_id": np.arange(n, dtype=np.int64),
                "user_id": rng.randint(0, 25, n).astype(np.int64),
                "event_type": rng.choice(["view", "click", "buy"], n),
                # coarse ts grid so (user, type) groups carry exact ties
                # and the event_id tie-break decides
                "ts": pd.to_datetime(
                    rng.randint(0, 50, n).astype(np.int64) * 1_000_000,
                    unit="us",
                ).astype("datetime64[us]"),
                "value": rng.rand(n),
            }
        )
        out = (
            compact_latest(rd.from_pandas(df).repartition(13))
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        ref = (
            df.sort_values(
                ["ts", "event_id"], ascending=[False, False], kind="mergesort"
            )
            .drop_duplicates(["user_id", "event_type"], keep="first")
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out[ref.columns.tolist()], ref)

    def test_one_row_per_key_and_idempotent(self, ray_session):
        from ocr_platform_ray.functions.events import compact_latest

        rng = np.random.RandomState(5)
        n = 300
        df = pd.DataFrame(
            {
                "event_id": np.arange(n, dtype=np.int64),
                "user_id": rng.randint(0, 10, n).astype(np.int64),
                "event_type": rng.choice(["a", "b"], n),
                "ts": pd.to_datetime(
                    np.arange(n, dtype=np.int64) * 1_000, unit="us"
                ).astype("datetime64[us]"),
                "value": rng.rand(n),
            }
        )
        once = compact_latest(rd.from_pandas(df).repartition(7)).to_pandas()
        assert not once.duplicated(["user_id", "event_type"]).any()
        twice = (
            compact_latest(rd.from_pandas(once))
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            twice,
            once.sort_values("event_id").reset_index(drop=True),
        )


def _gini_bruteforce(x: np.ndarray) -> float:
    x = np.sort(np.asarray(x, dtype=np.float64))
    n = len(x)
    i = np.arange(1, n + 1)
    return float(((2 * i - n - 1) * x).sum() / (n * x.sum()))


class TestGiniByGroup:
    def test_matches_bruteforce(self, ray_session):
        from ocr_platform_ray.functions.sketches import gini_by_group

        df = _docs(seed=17)
        out = (
            gini_by_group(
                rd.from_pandas(df).repartition(9), "source", "n_chars"
            )
            .to_pandas()
            .set_index("source")["gini"]
        )
        for g, sub in df.groupby("source"):
            assert out[g] == pytest.approx(
                _gini_bruteforce(sub["n_chars"].to_numpy()), abs=1e-6
            )

    def test_known_extremes(self, ray_session):
        from ocr_platform_ray.functions.sketches import gini_by_group

        # equal values -> 0; one holder of everything -> (n-1)/n
        df = pd.DataFrame(
            {
                "g": ["eq"] * 10 + ["conc"] * 10,
                "v": [5] * 10 + [0] * 9 + [100],
            }
        )
        # Gini with a zero-mass tail: shift 0s to a tiny epsilon is NOT
        # needed — the rank form handles zeros exactly
        out = (
            gini_by_group(rd.from_pandas(df).repartition(4), "g", "v")
            .to_pandas()
            .set_index("g")["gini"]
        )
        assert out["eq"] == 0.0
        assert out["conc"] == pytest.approx(0.9, abs=1e-6)

    def test_cell_guard_fires(self, ray_session):
        from ocr_platform_ray.functions.sketches import gini_by_group

        df = pd.DataFrame(
            {"g": ["a"] * 200, "v": np.arange(200, dtype=np.int64)}
        )
        with pytest.raises(ValueError, match="gini_by_group"):
            gini_by_group(
                rd.from_pandas(df).repartition(4), "g", "v", max_cells=20
            ).materialize()
