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


class TestPriorityDedup:
    def test_matches_bruteforce(self, ray_session):
        from ocr_platform_ray.functions.dedup import priority_dedup

        rng = np.random.RandomState(5)
        texts = [f"text {i % 40}" for i in range(300)]  # heavy planted dups
        df = pd.DataFrame(
            {
                "doc_id": np.arange(300, dtype=np.int64),
                "text": texts,
                "prio": rng.randint(0, 5, 300).astype(np.int64),
            }
        )
        out = sorted(
            priority_dedup(rd.from_pandas(df).repartition(9))
            .to_pandas()["doc_id"]
        )
        ref = sorted(
            df.sort_values(["prio", "doc_id"], kind="mergesort")
            .drop_duplicates("text", keep="first")["doc_id"]
        )
        assert out == ref
        assert len(out) == 40

    def test_prefers_lower_priority_over_lower_id(self, ray_session):
        from ocr_platform_ray.functions.dedup import priority_dedup

        df = pd.DataFrame(
            {
                "doc_id": np.array([1, 2], dtype=np.int64),
                "text": ["same", "same"],
                "prio": np.array([9, 0], dtype=np.int64),
            }
        )
        out = priority_dedup(rd.from_pandas(df).repartition(2)).to_pandas()
        assert list(out["doc_id"]) == [2]


class TestPromoRevenueShare:
    def test_matches_bruteforce(self, ray_session):
        from ocr_platform_ray.functions.relational import promo_revenue_share

        li = _lineitem(400, seed=8, orders=50).rename(
            columns={"l_orderkey": "l_partkey"}
        )[["l_partkey", "l_extendedprice", "l_discount"]]
        part = pd.DataFrame(
            {
                "p_partkey": np.arange(50, dtype=np.int64),
                "p_type": ["PROMO" if i % 3 == 0 else "STANDARD" for i in range(50)],
            }
        )
        out = promo_revenue_share(
            rd.from_pandas(li).repartition(7), rd.from_pandas(part)
        ).to_pandas()
        u = (
            np.round(li["l_extendedprice"].to_numpy() * 100).astype(np.int64)
            * (100 - np.round(li["l_discount"].to_numpy() * 100).astype(np.int64))
        )
        promo = u[(li["l_partkey"] % 3 == 0).to_numpy()].sum()
        want = 100.0 * promo / u.sum()
        assert len(out) == 1
        assert out["promo_pct"].iloc[0] == pytest.approx(want, abs=1e-6)


class TestPercentRank:
    def test_matches_bruteforce(self, ray_session):
        from ocr_platform_ray.functions.relational import percent_rank_by_group

        rng = np.random.RandomState(17)
        df = pd.DataFrame(
            {
                "doc_id": np.arange(400, dtype=np.int64),
                "lang": rng.choice(["en", "fr", "zh"], 400),
                "n_chars": rng.randint(10, 60, 400).astype(np.int64),  # ties
            }
        )
        out = (
            percent_rank_by_group(
                rd.from_pandas(df).repartition(9), "lang", "n_chars"
            )
            .to_pandas()
            .set_index("doc_id")["pr"]
        )
        for _, g in df.groupby("lang"):
            rank = g["n_chars"].rank(method="min")
            want = (rank - 1) / (len(g) - 1)
            for did, w in zip(g["doc_id"], want):
                assert out[did] == pytest.approx(w, abs=1e-6)

    def test_single_row_group_is_zero(self, ray_session):
        from ocr_platform_ray.functions.relational import percent_rank_by_group

        df = pd.DataFrame(
            {"doc_id": [0], "lang": ["xx"], "n_chars": np.array([5], np.int64)}
        )
        out = percent_rank_by_group(rd.from_pandas(df), "lang", "n_chars")
        assert out.to_pandas()["pr"].iloc[0] == 0.0


class TestTopSupplier:
    def test_ties_are_kept(self, ray_session):
        from ocr_platform_ray.functions.relational import top_supplier
        import pyarrow.parquet as pq
        import tempfile, os

        # two suppliers engineered to the same max revenue
        li = pd.DataFrame(
            {
                "l_suppkey": np.array([1, 1, 2, 3], dtype=np.int64),
                "l_extendedprice": [50.0, 50.0, 100.0, 30.0],
                "l_discount": [0.0, 0.0, 0.0, 0.0],
            }
        )
        with tempfile.TemporaryDirectory() as d:
            pq.write_table(
                pa.Table.from_pydict(
                    {
                        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
                        "s_name": pa.array(["s_one", "s_two", "s_three"]),
                    }
                ),
                os.path.join(d, "supplier.parquet"),
            )
            out = (
                top_supplier(rd.from_pandas(li).repartition(3), d)
                .to_pandas()
                .sort_values("s_suppkey")
            )
        assert list(out["s_suppkey"]) == [1, 2]
        assert list(out["total_revenue"]) == [100.0, 100.0]
        assert list(out["s_name"]) == ["s_one", "s_two"]
