"""Round-5 batch-10 operators pinned against brute-force references and
DuckDB at sf0.001: TPC-H Q13 custdist (zero bucket included), Q17
correlated small-quantity revenue, Q19 disjunctive-predicate revenue,
Q22 sales opportunity (scalar subquery + anti join), Q11-shaped
fraction-of-total HAVING, and Q8-shaped market share."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT *"
            f" FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


class TestCustdist:
    def test_zero_bucket_and_counts(self, ray_session):
        from ocr_platform_ray.functions.relational import (
            customer_order_distribution,
        )

        rng = np.random.RandomState(7)
        # 40 customers, only 25 place orders -> nontrivial zero bucket
        ords = pd.DataFrame(
            {"o_custkey": rng.randint(0, 25, 200).astype(np.int64)}
        )
        cust = pd.DataFrame({"c_custkey": np.arange(40, dtype=np.int64)})
        out = (
            customer_order_distribution(
                rd.from_pandas(ords).repartition(6), rd.from_pandas(cust)
            )
            .to_pandas()
        )
        per = ords.groupby("o_custkey").size()
        ref = (
            per.reindex(np.arange(40), fill_value=0)
            .value_counts()
            .rename_axis("c_count")
            .reset_index(name="custdist")
            .astype("int64")
        )
        pd.testing.assert_frame_equal(_sorted(out), _sorted(ref))
        assert int(out.loc[out["c_count"] == 0, "custdist"].iloc[0]) == 15

    def test_sf0001_matches_duckdb(self, ray_session):
        import __ray_entry__ as entry

        out = entry.queries()["q_custdist"](SF).to_pandas()
        ref = _con().execute(entry.oracle_sql()["q_custdist"]).df()
        pd.testing.assert_frame_equal(
            _sorted(out), _sorted(ref), check_dtype=False
        )


class TestSmallQtyRevenue:
    def test_sf0001_matches_duckdb(self, ray_session):
        import __ray_entry__ as entry

        out = entry.queries()["q_small_qty_revenue"](SF).to_pandas()
        ref = _con().execute(entry.oracle_sql()["q_small_qty_revenue"]).df()
        assert len(out) == len(ref) == 1
        assert out["avg_yearly"].iloc[0] == pytest.approx(
            ref["avg_yearly"].iloc[0], abs=1e-9
        )

    def test_threshold_is_exact_integer_compare(self, ray_session):
        # a part whose avg qty is exactly 5x one row's qty: the strict <
        # must EXCLUDE that row (0.2*avg == qty), mirroring SQL
        from ocr_platform_ray.functions.relational import (
            small_quantity_revenue,
        )
        import pyarrow.parquet as pq

        li = pd.DataFrame(
            {
                "l_partkey": np.array([1, 1, 1, 2, 2], dtype=np.int64),
                # part 1: qtys 2,10,18 -> avg 10, 0.2*avg = 2 == row qty
                "l_quantity": [2.0, 10.0, 18.0, 4.0, 40.0],
                "l_extendedprice": [100.0, 100.0, 100.0, 70.0, 100.0],
            }
        )
        import tempfile, os

        d = tempfile.mkdtemp()
        pq.write_table(
            pa.table(
                {
                    "p_partkey": pa.array([1, 2], pa.int64()),
                    "p_brand": pa.array(["Brand#23", "Brand#23"]),
                }
            ),
            os.path.join(d, "part.parquet"),
        )
        out = small_quantity_revenue(
            rd.from_pandas(li).repartition(3), d, brand="Brand#23"
        ).to_pandas()
        # part 1 contributes nothing (2*5*3 == 30 not < 30); part 2's
        # qty-4 row qualifies (4*5*2=40 < 44): 70.00 / 7 = 10.0
        assert out["avg_yearly"].iloc[0] == pytest.approx(10.0)


class TestDisjunctiveRevenue:
    def test_planted_branches(self, ray_session):
        from ocr_platform_ray.functions.relational import disjunctive_revenue

        li = pd.DataFrame(
            {
                "l_partkey": np.array([1, 2, 3, 1, 2], dtype=np.int64),
                "l_quantity": [5.0, 15.0, 25.0, 30.0, 5.0],
                "l_extendedprice": [100.0, 200.0, 300.0, 100.0, 100.0],
                "l_discount": [0.0, 0.1, 0.05, 0.0, 0.0],
            }
        )
        part = pd.DataFrame(
            {
                "p_partkey": np.array([1, 2, 3], dtype=np.int64),
                "p_brand": ["Brand#12", "Brand#23", "Brand#5"],
                "p_size": np.array([3, 8, 12], dtype=np.int32),
            }
        )
        out = disjunctive_revenue(
            rd.from_pandas(li).repartition(2), rd.from_pandas(part)
        ).to_pandas()
        # rows 0,1,2 hit branches 1,2,3; rows 3,4 miss (qty out of range)
        assert int(out["n_items"].iloc[0]) == 3
        assert out["revenue"].iloc[0] == pytest.approx(
            100.0 + 200.0 * 0.9 + 300.0 * 0.95
        )

    def test_sf0001_matches_duckdb(self, ray_session):
        import __ray_entry__ as entry

        out = entry.queries()["q_disjunctive_revenue"](SF).to_pandas()
        ref = _con().execute(
            entry.oracle_sql()["q_disjunctive_revenue"]
        ).df()
        assert int(out["n_items"].iloc[0]) == int(ref["n_items"].iloc[0])
        assert out["revenue"].iloc[0] == pytest.approx(
            ref["revenue"].iloc[0], abs=1e-9
        )


class TestSalesOpportunity:
    def test_sf0001_matches_duckdb(self, ray_session):
        import __ray_entry__ as entry

        out = entry.queries()["q_sales_opportunity"](SF).to_pandas()
        ref = _con().execute(entry.oracle_sql()["q_sales_opportunity"]).df()
        pd.testing.assert_frame_equal(
            _sorted(out), _sorted(ref), check_dtype=False
        )
        assert len(out) > 0


class TestImportantParts:
    def test_matches_bruteforce(self, ray_session):
        from ocr_platform_ray.functions.relational import fraction_of_total

        rng = np.random.RandomState(11)
        li = pd.DataFrame(
            {
                "l_partkey": rng.randint(0, 30, 500).astype(np.int64),
                "l_extendedprice": np.round(rng.rand(500) * 900 + 100, 2),
            }
        )
        out = fraction_of_total(
            rd.from_pandas(li).repartition(7), 5, 4
        ).to_pandas()
        cents = np.round(li["l_extendedprice"].to_numpy() * 100).astype(
            np.int64
        )
        sums = pd.DataFrame({"k": li["l_partkey"], "c": cents}).groupby(
            "k"
        )["c"].sum()
        thr = (5 * int(sums.sum())) // (4 * len(sums))
        ref = sums[sums > thr]
        assert sorted(out["l_partkey"]) == sorted(ref.index)
        got = dict(zip(out["l_partkey"], out["value"]))
        for k, c in ref.items():
            assert got[k] == pytest.approx(round(c / 100.0, 2), abs=1e-9)


class TestMarketShare:
    def test_sf0001_matches_duckdb(self, ray_session):
        import __ray_entry__ as entry

        out = entry.queries()["q_market_share"](SF).to_pandas()
        ref = _con().execute(entry.oracle_sql()["q_market_share"]).df()
        pd.testing.assert_frame_equal(
            _sorted(out), _sorted(ref), check_dtype=False
        )
        # shares are genuine fractions
        assert ((out["mkt_share"] >= 0) & (out["mkt_share"] <= 1)).all()
