"""Round-5 batch-6 operators pinned against brute-force references:
user-journey path strings, the event transition matrix, INTERSECT,
GROUP BY CUBE, and the Benford first-digit audit — plus the empty-result
schema-safety of the set-ops."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


def _events(n=800, seed=7, users=30):
    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.randint(0, users, n).astype(np.int64),
            "event_type": rng.choice(["view", "click", "buy"], n),
            # coarse ts grid -> exact ties, event_id decides
            "ts": pd.to_datetime(
                rng.randint(0, 40, n).astype(np.int64) * 1_000_000, unit="us"
            ).astype("datetime64[us]"),
            "value": rng.rand(n),
        }
    )


class TestUserPaths:
    def test_matches_bruteforce(self, ray_session):
        from ocr_platform_ray.functions.events import user_paths

        df = _events()
        out = (
            user_paths(rd.from_pandas(df).repartition(9))
            .to_pandas()
            .set_index("user_id")["path"]
        )
        ref = (
            df.sort_values(["ts", "event_id"], kind="mergesort")
            .groupby("user_id")["event_type"]
            .apply(lambda s: "->".join(s.head(20)))
        )
        assert len(out) == len(ref)
        for u in ref.index:
            assert out[u] == ref[u], u

    def test_max_steps_caps(self, ray_session):
        from ocr_platform_ray.functions.events import user_paths

        df = _events(200, seed=9, users=3)
        out = user_paths(
            rd.from_pandas(df).repartition(5), max_steps=4
        ).to_pandas()
        assert (out["path"].str.split("->").str.len() <= 4).all()


class TestEventTransitions:
    def test_matches_bruteforce(self, ray_session):
        from ocr_platform_ray.functions.events import event_transitions

        df = _events(seed=13)
        out = (
            event_transitions(rd.from_pandas(df).repartition(11))
            .to_pandas()
            .set_index(["prev_type", "next_type"])["n"]
        )
        s = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev = s.groupby("user_id")["event_type"].shift()
        m = prev.notna()
        ref = (
            pd.DataFrame({"p": prev[m], "n_": s["event_type"][m]})
            .groupby(["p", "n_"])
            .size()
        )
        assert out.sum() == ref.sum()
        for (p, nx), cnt in ref.items():
            assert out[(p, nx)] == cnt, (p, nx)


class TestIntersectDistinct:
    def test_matches_set_intersection(self, ray_session):
        from ocr_platform_ray.functions.relational import intersect_distinct

        rng = np.random.RandomState(3)
        a = pd.DataFrame({"v": [f"t{i}" for i in rng.randint(0, 50, 300)]})
        b = pd.DataFrame({"v": [f"t{i}" for i in rng.randint(25, 70, 300)]})
        out = intersect_distinct(
            rd.from_pandas(a).repartition(7),
            rd.from_pandas(b).repartition(5),
            "v",
        ).to_pandas()
        assert sorted(out["v"]) == sorted(set(a["v"]) & set(b["v"]))

    def test_disjoint_keeps_schema(self, ray_session):
        from ocr_platform_ray.functions.relational import intersect_distinct

        a = pd.DataFrame({"v": ["x", "y"]})
        b = pd.DataFrame({"v": ["z"]})
        ds = intersect_distinct(rd.from_pandas(a), rd.from_pandas(b), "v")
        assert ds.schema().names == ["v"]
        assert ds.count() == 0


class TestCubeOrders:
    def test_matches_bruteforce(self, ray_session):
        from ocr_platform_ray.functions.relational import cube_orders

        rng = np.random.RandomState(21)
        n = 500
        df = pd.DataFrame(
            {
                "o_orderdate": pd.to_datetime(
                    rng.randint(0, 1100, n), unit="D", origin="1995-01-01"
                ).astype("datetime64[us]"),
                "o_orderpriority": rng.choice(["1-URGENT", "3-MEDIUM"], n),
                "o_totalprice": (rng.rand(n) * 1000).round(2),
            }
        )
        out = cube_orders(rd.from_pandas(df).repartition(7)).to_pandas()
        yrs = df["o_orderdate"].dt.year.astype(str)
        cents = np.rint(df["o_totalprice"].to_numpy() * 100).astype(np.int64)
        base = pd.DataFrame(
            {"year": yrs, "priority": df["o_orderpriority"], "cents": cents}
        )
        n_year = base["year"].nunique()
        n_prio = base["priority"].nunique()
        n_leaf = base.groupby(["year", "priority"]).ngroups
        assert len(out) == n_leaf + n_year + n_prio + 1
        got = out.set_index(["year", "priority"])
        # leaf
        for (y, p), sub in base.groupby(["year", "priority"]):
            assert got.loc[(y, p), "n_orders"] == len(sub)
            assert got.loc[(y, p), "revenue"] == round(
                float(sub["cents"].sum()) / 100.0
            )
        # per-priority subtotal (the axis rollup lacks)
        for p, sub in base.groupby("priority"):
            assert got.loc[("ALL", p), "n_orders"] == len(sub)
        assert got.loc[("ALL", "ALL"), "n_orders"] == n

    def test_guard_fires(self, ray_session):
        from ocr_platform_ray.functions.relational import cube_orders

        df = pd.DataFrame(
            {
                "o_orderdate": pd.to_datetime(
                    np.arange(100) * 40, unit="D", origin="1990-01-01"
                ).astype("datetime64[us]"),
                "o_orderpriority": [f"p{i}" for i in range(100)],
                "o_totalprice": np.ones(100),
            }
        )
        with pytest.raises(ValueError, match="cube_orders"):
            cube_orders(rd.from_pandas(df).repartition(4), max_leaves=10)


class TestFirstDigit:
    def test_matches_bruteforce(self, ray_session):
        from ocr_platform_ray.functions.sketches import first_digit_counts

        rng = np.random.RandomState(5)
        df = pd.DataFrame(
            {
                "source": rng.choice(["a", "b"], 600),
                "n_chars": rng.randint(-5, 5000, 600).astype(np.int64),
            }
        )
        out = (
            first_digit_counts(
                rd.from_pandas(df).repartition(9), "source", "n_chars"
            )
            .to_pandas()
            .set_index(["source", "digit"])["n"]
        )
        pos = df[df["n_chars"] > 0].copy()
        pos["digit"] = pos["n_chars"].astype(str).str[0].astype(np.int64)
        ref = pos.groupby(["source", "digit"]).size()
        assert out.sum() == len(pos)
        for k, v in ref.items():
            assert out[k] == v, k
