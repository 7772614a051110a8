"""Round-5 batch-11 operators pinned against planted references and
DuckDB at sf0.001: TPC-H Q4 order-priority EXISTS check, Q12-shaped
conditional join aggregate, Q21-shaped sole-late-supplier report, and
Q16-shaped distinct-supplier census with a NOT IN exclusion."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem".split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT *"
            f" FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


class TestOrderPriority:
    def test_planted_exists_boundary(self, ray_session):
        from ocr_platform_ray.functions.relational import (
            order_priority_count,
        )

        day = np.timedelta64(1, "D")
        base = np.datetime64("1996-02-01", "us")
        orders = pd.DataFrame(
            {
                "o_orderkey": np.arange(4, dtype=np.int64),
                "o_orderdate": [base] * 4,
                "o_orderpriority": ["1-URGENT", "1-URGENT", "5-LOW", "5-LOW"],
            }
        )
        # order 0: shipped exactly +30d (NOT late: strict >); order 1:
        # +31d (late); order 2: two lines, one late; order 3: no lines
        li = pd.DataFrame(
            {
                "l_orderkey": np.array([0, 1, 2, 2], dtype=np.int64),
                "l_shipdate": [
                    base + 30 * day,
                    base + 31 * day,
                    base + 1 * day,
                    base + 90 * day,
                ],
            }
        )
        out = order_priority_count(
            rd.from_pandas(orders).repartition(2),
            rd.from_pandas(li).repartition(3),
            grace_days=30,
        ).to_pandas()
        got = dict(zip(out["o_orderpriority"], out["order_count"]))
        assert got == {"1-URGENT": 1, "5-LOW": 1}

    def test_sf0001_matches_duckdb(self, ray_session):
        import __ray_entry__ as entry

        out = entry.queries()["q_order_priority"](SF).to_pandas()
        ref = _con().execute(entry.oracle_sql()["q_order_priority"]).df()
        pd.testing.assert_frame_equal(
            _sorted(out), _sorted(ref), check_dtype=False
        )
        assert len(out) > 0


class TestPriorityLines:
    def test_planted_conditional_counts(self, ray_session):
        from ocr_platform_ray.functions.relational import (
            priority_line_counts,
        )

        li = pd.DataFrame(
            {
                "l_orderkey": np.array([0, 0, 1, 2, 2, 2], dtype=np.int64),
                "l_returnflag": ["A", "N", "A", "N", "N", "R"],
            }
        )
        orders = pd.DataFrame(
            {
                "o_orderkey": np.arange(3, dtype=np.int64),
                "o_orderpriority": ["1-URGENT", "3-MEDIUM", "2-HIGH"],
            }
        )
        out = priority_line_counts(
            rd.from_pandas(li).repartition(3),
            rd.from_pandas(orders).repartition(2),
        ).to_pandas()
        got = {
            r["l_returnflag"]: (r["high_line_count"], r["low_line_count"])
            for _, r in out.iterrows()
        }
        # A: order0(high)+order1(low); N: order0(high)+2x order2(high);
        # R: order2(high)
        assert got == {"A": (1, 1), "N": (3, 0), "R": (1, 0)}

    def test_sf0001_matches_duckdb(self, ray_session):
        import __ray_entry__ as entry

        out = entry.queries()["q_priority_lines"](SF).to_pandas()
        ref = _con().execute(entry.oracle_sql()["q_priority_lines"]).df()
        pd.testing.assert_frame_equal(
            _sorted(out), _sorted(ref), check_dtype=False
        )


class TestWaitingSuppliers:
    def test_planted_sole_late_semantics(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from ocr_platform_ray.functions.relational import waiting_suppliers

        day = np.timedelta64(1, "D")
        base = np.datetime64("1996-01-01", "us")
        # order 0 ('F', 2 suppliers, only supp 1 late) -> counts for 1
        # order 1 ('F', 2 suppliers, both late)        -> nobody
        # order 2 ('F', 1 supplier, late)              -> single-supplier, no
        # order 3 ('O', 2 suppliers, only supp 2 late) -> wrong status, no
        orders = pa.table(
            {
                "o_orderkey": pa.array([0, 1, 2, 3], pa.int64()),
                "o_orderdate": pa.array([base] * 4, pa.timestamp("us")),
                "o_orderstatus": pa.array(["F", "F", "F", "O"]),
            }
        )
        li = pa.table(
            {
                "l_orderkey": pa.array(
                    [0, 0, 1, 1, 2, 3, 3], pa.int64()
                ),
                "l_suppkey": pa.array([1, 2, 1, 2, 1, 2, 3], pa.int64()),
                "l_shipdate": pa.array(
                    [
                        base + 90 * day,
                        base + 5 * day,
                        base + 90 * day,
                        base + 90 * day,
                        base + 90 * day,
                        base + 90 * day,
                        base + 5 * day,
                    ],
                    pa.timestamp("us"),
                ),
            }
        )
        supp = pa.table(
            {
                "s_suppkey": pa.array([1, 2, 3], pa.int64()),
                "s_name": pa.array(["S1", "S2", "S3"]),
            }
        )
        pq.write_table(orders, str(tmp_path / "orders.parquet"))
        pq.write_table(li, str(tmp_path / "lineitem.parquet"))
        pq.write_table(supp, str(tmp_path / "supplier.parquet"))
        out = waiting_suppliers(str(tmp_path), late_days=60).to_pandas()
        assert list(out["s_name"]) == ["S1"]
        assert list(out["numwait"]) == [1]

    def test_sf0001_matches_duckdb(self, ray_session):
        import __ray_entry__ as entry

        out = entry.queries()["q_waiting_suppliers"](SF).to_pandas()
        ref = _con().execute(entry.oracle_sql()["q_waiting_suppliers"]).df()
        pd.testing.assert_frame_equal(
            out.reset_index(drop=True), ref, check_dtype=False
        )


class TestPartSuppliers:
    def test_sf0001_matches_duckdb(self, ray_session):
        import __ray_entry__ as entry

        out = entry.queries()["q_part_suppliers"](SF).to_pandas()
        ref = _con().execute(entry.oracle_sql()["q_part_suppliers"]).df()
        pd.testing.assert_frame_equal(
            _sorted(out), _sorted(ref), check_dtype=False
        )
        assert len(out) > 0

    def test_distinct_across_parts_same_descriptor(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from ocr_platform_ray.functions.relational import (
            part_supplier_counts,
        )

        # two parts with the SAME descriptor, both shipped by supplier 1:
        # the census must count supplier 1 ONCE (distinct across partkeys)
        part = pa.table(
            {
                "p_partkey": pa.array([1, 2, 3], pa.int64()),
                "p_brand": pa.array(["Brand#1", "Brand#1", "Brand#1"]),
                "p_type": pa.array(["LARGE", "LARGE", "PROMO"]),
                "p_size": pa.array([5, 5, 5], pa.int32()),
            }
        )
        li = pa.table(
            {
                "l_partkey": pa.array([1, 2, 2, 3], pa.int64()),
                "l_suppkey": pa.array([1, 1, 2, 1], pa.int64()),
            }
        )
        supp = pa.table(
            {
                "s_suppkey": pa.array([1, 2], pa.int64()),
                "s_acctbal": pa.array([5000.0, 500.0]),
            }
        )
        pq.write_table(part, str(tmp_path / "part.parquet"))
        pq.write_table(li, str(tmp_path / "lineitem.parquet"))
        pq.write_table(supp, str(tmp_path / "supplier.parquet"))
        out = part_supplier_counts(
            str(tmp_path), min_acctbal=1000.0
        ).to_pandas()
        # supplier 2 excluded (acctbal<1000); PROMO part excluded; so one
        # descriptor row with supplier_cnt == 1 (supp 1 deduped across
        # parts 1 and 2)
        assert len(out) == 1
        assert int(out["supplier_cnt"].iloc[0]) == 1
        assert out["p_type"].iloc[0] == "LARGE"
