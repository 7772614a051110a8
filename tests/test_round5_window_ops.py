"""Round-5 window/distinct operators pinned against brute-force pandas
references on adversarial partitionings: event_gaps (LAG analogue),
rolling_avg_per_user (ROWS-frame analogue), exact_distinct_per_key."""

import numpy as np
import pandas as pd

import ray.data as rd


def _events(n=400, users=23, seed=11):
    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.randint(0, users, n).astype(np.int64),
            # duplicate timestamps on purpose: the (ts, event_id) tie-break
            # must decide the order identically on both sides
            "ts": pd.to_datetime(
                rng.randint(0, 5_000, n) * 1_000_000, unit="us"
            ).astype("datetime64[us]"),
            "value": rng.rand(n) * 100,
        }
    )


class TestEventGaps:
    def test_matches_bruteforce(self, ray_session):
        from ocr_platform_ray.functions.events import event_gaps

        df = _events()
        out = (
            event_gaps(rd.from_pandas(df).repartition(9))
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )

        ref = df.sort_values(["user_id", "ts", "event_id"]).copy()
        ts_us = ref["ts"].astype("int64")
        gap = ts_us.groupby(ref["user_id"]).diff()
        ref = pd.DataFrame(
            {"event_id": ref["event_id"], "gap_us": gap}
        ).dropna()
        ref["gap_us"] = ref["gap_us"].astype(np.int64)
        ref = ref.sort_values("event_id").reset_index(drop=True)

        pd.testing.assert_frame_equal(out, ref)

    def test_single_event_users_emit_nothing(self, ray_session):
        from ocr_platform_ray.functions.events import event_gaps

        df = _events(n=10, users=10, seed=3)  # mostly singleton users
        out = event_gaps(rd.from_pandas(df)).to_pandas()
        multi = df["user_id"].value_counts()
        expected = int((multi - 1).clip(lower=0).sum())
        assert len(out) == expected


class TestRollingAvg:
    def test_matches_pandas_rolling(self, ray_session):
        from ocr_platform_ray.functions import round_half_away_np
        from ocr_platform_ray.functions.events import rolling_avg_per_user

        df = _events(seed=29)
        out = (
            rolling_avg_per_user(rd.from_pandas(df).repartition(7))
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )

        ref = df.sort_values(["user_id", "ts", "event_id"]).copy()
        roll = (
            ref.groupby("user_id", sort=False)["value"]
            .rolling(3, min_periods=1)
            .mean()
            .reset_index(level=0, drop=True)
        )
        ref = pd.DataFrame(
            {
                "event_id": ref["event_id"].to_numpy(),
                "rolling_avg": round_half_away_np(roll.to_numpy(), 6),
            }
        ).sort_values("event_id").reset_index(drop=True)

        pd.testing.assert_frame_equal(out, ref)


class TestExactDistinctPerKey:
    def test_matches_nunique(self, ray_session):
        from ocr_platform_ray.functions.sketches import exact_distinct_per_key

        rng = np.random.RandomState(5)
        df = pd.DataFrame(
            {
                "k": rng.choice(list("abcdef"), 600),
                # heavy duplication ACROSS partitions: per-batch partials
                # must still produce the exact global distinct count
                "v": rng.choice([f"text-{i}" for i in range(40)], 600),
            }
        )
        out = (
            exact_distinct_per_key(rd.from_pandas(df).repartition(11), "k", "v")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        ref = (
            df.groupby("k", as_index=False)
            .agg(n_rows=("v", "size"), n_distinct=("v", "nunique"))
            .astype({"n_rows": "int64", "n_distinct": "int64"})
            .sort_values("k")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, ref)

    def test_all_unique_and_all_same(self, ray_session):
        from ocr_platform_ray.functions.sketches import exact_distinct_per_key

        df = pd.DataFrame(
            {
                "k": ["u"] * 50 + ["s"] * 50,
                "v": [f"x{i}" for i in range(50)] + ["same"] * 50,
            }
        )
        out = (
            exact_distinct_per_key(rd.from_pandas(df).repartition(4), "k", "v")
            .to_pandas()
            .set_index("k")
        )
        assert out.loc["u", "n_distinct"] == 50 and out.loc["u", "n_rows"] == 50
        assert out.loc["s", "n_distinct"] == 1 and out.loc["s", "n_rows"] == 50
