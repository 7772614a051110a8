"""Round-5 batch-8 operators pinned against brute-force references:
TPC-H Q6 forecast revenue, Q18 large-volume orders, and the k-anonymity
governance audit (including its empty-result schema safety)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def _lineitem(n=600, seed=3, orders=80):
    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "l_orderkey": rng.randint(0, orders, n).astype(np.int64),
            "l_quantity": rng.randint(1, 51, n).astype(np.float64),
            "l_extendedprice": np.round(rng.rand(n) * 1000, 2),
            "l_discount": rng.randint(0, 11, n) / 100.0,
        }
    )


class TestLargeOrders:
    def test_matches_bruteforce(self, ray_session):
        from ocr_platform_ray.functions.relational import large_orders

        li = _lineitem()
        orders = pd.DataFrame(
            {
                "o_orderkey": np.arange(80, dtype=np.int64),
                "o_custkey": (np.arange(80, dtype=np.int64) * 7) % 11,
                "o_totalprice": np.round(np.arange(80) * 13.37, 2),
            }
        )
        cust = pd.DataFrame(
            {
                "c_custkey": np.arange(11, dtype=np.int64),
                "c_name": [f"Customer#{i:09d}" for i in range(11)],
            }
        )
        thr = 150
        out = (
            large_orders(
                rd.from_pandas(li).repartition(7),
                rd.from_pandas(orders).repartition(3),
                rd.from_pandas(cust),
                min_qty=thr,
            )
            .to_pandas()
            .sort_values("o_orderkey")
            .reset_index(drop=True)
        )
        qty = (
            li.assign(q=li["l_quantity"].astype(np.int64))
            .groupby("l_orderkey", as_index=False)["q"]
            .sum()
        )
        qty = qty[qty["q"] > thr]
        ref = (
            qty.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
            .merge(cust, left_on="o_custkey", right_on="c_custkey")
            .sort_values("o_orderkey")
            .reset_index(drop=True)
        )
        assert len(out) == len(ref) > 0
        assert list(out["o_orderkey"]) == list(ref["o_orderkey"])
        assert list(out["sum_qty"]) == list(ref["q"])
        assert list(out["c_name"]) == list(ref["c_name"])
        assert np.allclose(out["o_totalprice"], ref["o_totalprice"])

    def test_threshold_filters_everything(self, ray_session):
        from ocr_platform_ray.functions.relational import large_orders

        li = _lineitem(100, seed=5, orders=90)  # ~1 line/order -> tiny sums
        orders = pd.DataFrame(
            {
                "o_orderkey": np.arange(90, dtype=np.int64),
                "o_custkey": np.zeros(90, dtype=np.int64),
                "o_totalprice": np.ones(90),
            }
        )
        cust = pd.DataFrame({"c_custkey": [0], "c_name": ["only"]})
        out = large_orders(
            rd.from_pandas(li), rd.from_pandas(orders), rd.from_pandas(cust),
            min_qty=10_000,
        )
        assert out.count() == 0


class TestKAnonymity:
    def test_matches_bruteforce(self, ray_session):
        from ocr_platform_ray.functions.relational import k_anonymity_audit

        rng = np.random.RandomState(11)
        df = pd.DataFrame(
            {
                "c_nationkey": rng.randint(0, 6, 500).astype(np.int32),
                "c_mktsegment": rng.choice(["A", "B", "C"], 500),
            }
        )
        k = 25
        out = (
            k_anonymity_audit(
                rd.from_pandas(df).repartition(9),
                ["c_nationkey", "c_mktsegment"],
                k=k,
            )
            .to_pandas()
            .sort_values(["c_nationkey", "c_mktsegment"])
            .reset_index(drop=True)
        )
        ref = (
            df.groupby(["c_nationkey", "c_mktsegment"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        ref = ref[ref["n"] < k].sort_values(
            ["c_nationkey", "c_mktsegment"]
        ).reset_index(drop=True)
        assert len(out) == len(ref) > 0
        assert list(out["n"]) == list(ref["n"])
        assert list(out["c_nationkey"]) == list(ref["c_nationkey"])

    def test_empty_result_keeps_schema(self, ray_session):
        from ocr_platform_ray.functions.relational import k_anonymity_audit
        from ocr_platform_ray.queries import _schema_safe_table

        df = pd.DataFrame(
            {
                "c_nationkey": np.zeros(200, dtype=np.int32),
                "c_mktsegment": ["A"] * 200,
            }
        )
        t = _schema_safe_table(
            k_anonymity_audit(
                rd.from_pandas(df).repartition(4),
                ["c_nationkey", "c_mktsegment"],
                k=5,
            )
        )
        assert t.num_rows == 0
        assert t.column_names == ["c_nationkey", "c_mktsegment", "n"]
        assert t.schema.field("n").type == pa.int64()
        # polars blocks surface large_string; either utf8 flavor is fine
        assert t.schema.field("c_mktsegment").type in (
            pa.string(),
            pa.large_string(),
        )


class TestQ6Revenue:
    def test_matches_bruteforce_sf0001(self, ray_session):
        import pyarrow.parquet as pq

        from ocr_platform_ray.queries import q_q6_revenue

        sf = "/root/testdata/sf0.001"
        out = q_q6_revenue(sf).to_pandas()
        li = pq.read_table(
            f"{sf}/lineitem.parquet",
            columns=["l_shipdate", "l_discount", "l_quantity",
                     "l_extendedprice"],
        ).to_pandas()
        m = (
            (li["l_shipdate"] >= pd.Timestamp("1996-01-01"))
            & (li["l_shipdate"] < pd.Timestamp("1997-01-01"))
            & (li["l_discount"] >= 0.05)
            & (li["l_discount"] <= 0.07)
            & (li["l_quantity"] < 24)
        )
        sel = li[m]
        units = (
            np.round(sel["l_extendedprice"].to_numpy() * 100).astype(np.int64)
            * np.round(sel["l_discount"].to_numpy() * 100).astype(np.int64)
        ).sum()
        assert len(out) == 1
        assert int(out["n_items"].iloc[0]) == int(m.sum()) > 0
        assert out["revenue"].iloc[0] == pytest.approx(units / 1e4, abs=0.011)
