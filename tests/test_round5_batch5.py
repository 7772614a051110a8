"""Round-5 batch-5 operators pinned against brute-force pandas
references on adversarial partitionings: cohort retention, FK orphan
audit, the Q3-shaped shipping-priority join, and EXCEPT set-difference."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

DAY_US = 86_400_000_000


class TestRetention:
    def test_matches_bruteforce(self, ray_session):
        from ocr_platform_ray.functions.events import retention_counts

        rng = np.random.RandomState(29)
        n = 2000
        df = pd.DataFrame(
            {
                "user_id": rng.randint(0, 60, n).astype(np.int64),
                "ts": pd.to_datetime(
                    rng.randint(0, 12 * DAY_US, n), unit="us"
                ).astype("datetime64[us]"),
            }
        )
        out = (
            retention_counts(rd.from_pandas(df).repartition(9))
            .to_pandas()
            .sort_values("cohort_day")
            .reset_index(drop=True)
        )
        ud = pd.DataFrame(
            {
                "user_id": df["user_id"],
                "day": df["ts"].astype(np.int64) // DAY_US,
            }
        ).drop_duplicates()
        d0 = ud.groupby("user_id")["day"].min()
        days_by_user = ud.groupby("user_id")["day"].agg(set)
        rows = {}
        for u, first in d0.items():
            r = rows.setdefault(first, [0, 0, 0])
            r[0] += 1
            if first + 1 in days_by_user[u]:
                r[1] += 1
            if first + 7 in days_by_user[u]:
                r[2] += 1
        ref = pd.DataFrame(
            {
                "cohort_day": [
                    str(np.int64(d * DAY_US).astype("datetime64[us]").astype(
                        "datetime64[D]"
                    ))
                    for d in sorted(rows)
                ],
                "n_users": [rows[d][0] for d in sorted(rows)],
                "ret_1": [rows[d][1] for d in sorted(rows)],
                "ret_7": [rows[d][2] for d in sorted(rows)],
            }
        )
        for c in ("n_users", "ret_1", "ret_7"):
            ref[c] = ref[c].astype(np.int64)
        pd.testing.assert_frame_equal(
            out[["cohort_day", "n_users", "ret_1", "ret_7"]], ref
        )

    def test_cohort_sizes_sum_to_users(self, ray_session):
        from ocr_platform_ray.functions.events import retention_counts

        rng = np.random.RandomState(4)
        df = pd.DataFrame(
            {
                "user_id": rng.randint(0, 25, 400).astype(np.int64),
                "ts": pd.to_datetime(
                    rng.randint(0, 5 * DAY_US, 400), unit="us"
                ).astype("datetime64[us]"),
            }
        )
        out = retention_counts(rd.from_pandas(df).repartition(5)).to_pandas()
        assert out["n_users"].sum() == df["user_id"].nunique()
        assert (out["ret_1"] <= out["n_users"]).all()


class TestFkOrphanAudit:
    def test_planted_orphans(self, ray_session):
        from ocr_platform_ray.functions.relational import fk_orphan_audit

        rng = np.random.RandomState(11)
        fact = pd.DataFrame(
            {"fk": rng.randint(0, 30, 500).astype(np.int64)}
        )
        # dim covers only keys 0..19 -> keys 20..29 are orphans
        dim = pd.DataFrame({"pk": np.arange(20, dtype=np.int64)})
        out = fk_orphan_audit(
            [
                (
                    "fact.fk->dim",
                    rd.from_pandas(fact).repartition(7),
                    "fk",
                    rd.from_pandas(dim).repartition(3),
                    "pk",
                )
            ]
        ).to_pandas()
        uniq = set(fact["fk"])
        assert out.loc[0, "n_keys"] == len(uniq)
        assert out.loc[0, "n_orphans"] == len([k for k in uniq if k >= 20])


class TestShippingPriority:
    def test_matches_bruteforce(self, ray_session):
        from ocr_platform_ray.functions.relational import shipping_priority

        rng = np.random.RandomState(17)
        n_cust, n_ord, n_li = 40, 300, 1200
        cust = pd.DataFrame(
            {
                "c_custkey": np.arange(n_cust, dtype=np.int64),
                "c_mktsegment": rng.choice(["BUILDING", "AUTO"], n_cust),
            }
        )
        orders = pd.DataFrame(
            {
                "o_orderkey": np.arange(n_ord, dtype=np.int64),
                "o_custkey": rng.randint(0, n_cust, n_ord).astype(np.int64),
                "o_orderdate": pd.to_datetime(
                    rng.randint(0, 200, n_ord), unit="D", origin="1995-01-01"
                ).astype("datetime64[us]"),
                "o_orderpriority": rng.choice(["1-URGENT", "3-MEDIUM"], n_ord),
            }
        )
        li = pd.DataFrame(
            {
                "l_orderkey": rng.randint(0, n_ord, n_li).astype(np.int64),
                "l_extendedprice": (rng.rand(n_li) * 1000).round(2),
                "l_discount": rng.choice([0.0, 0.05, 0.1], n_li),
                "l_shipdate": pd.to_datetime(
                    rng.randint(0, 200, n_li), unit="D", origin="1995-01-01"
                ).astype("datetime64[us]"),
            }
        )
        out = shipping_priority(
            rd.from_pandas(li).repartition(9),
            rd.from_pandas(orders).repartition(5),
            rd.from_pandas(cust).repartition(3),
        ).to_pandas()

        cut = pd.Timestamp("1995-03-15")
        seg = set(cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"])
        o = orders[(orders["o_orderdate"] < cut)
                   & orders["o_custkey"].isin(seg)]
        l = li[li["l_shipdate"] > cut].copy()
        rev = l["l_extendedprice"] * (1 - l["l_discount"])
        l["cents"] = np.floor(np.abs(rev) * 100 + 0.5).astype(np.int64)
        m = l.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        tot = m.groupby(
            ["l_orderkey", "o_orderdate", "o_orderpriority"], as_index=False
        )["cents"].sum()
        ref = tot.sort_values(
            ["cents", "o_orderdate", "l_orderkey"],
            ascending=[False, True, True],
            kind="mergesort",
        ).head(10)
        ref["revenue"] = ref.pop("cents") / 100.0
        ref = ref.reset_index(drop=True)
        got = out.reset_index(drop=True)
        assert (got["l_orderkey"].to_numpy() == ref["l_orderkey"].to_numpy()).all()
        assert np.allclose(got["revenue"], ref["revenue"])


class TestExceptDistinct:
    def test_matches_set_difference(self, ray_session):
        from ocr_platform_ray.functions.relational import except_distinct

        rng = np.random.RandomState(3)
        a = pd.DataFrame({"v": [f"t{i}" for i in rng.randint(0, 50, 300)]})
        b = pd.DataFrame({"v": [f"t{i}" for i in rng.randint(25, 70, 300)]})
        out = except_distinct(
            rd.from_pandas(a).repartition(7),
            rd.from_pandas(b).repartition(5),
            "v",
        ).to_pandas()
        want = sorted(set(a["v"]) - set(b["v"]))
        assert sorted(out["v"]) == want

    def test_empty_right_returns_distinct_left(self, ray_session):
        from ocr_platform_ray.functions.relational import except_distinct

        a = pd.DataFrame({"v": ["x", "x", "y"]})
        b = pd.DataFrame({"v": pd.Series([], dtype=str)})
        out = except_distinct(rd.from_pandas(a), rd.from_pandas(b), "v")
        assert sorted(out.to_pandas()["v"]) == ["x", "y"]
