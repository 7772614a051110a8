"""Round-5 batch-12 operators pinned against planted references and
DuckDB at sf0.001: TPC-H Q2-shaped minimum-cost supplier (correlated
MIN with keep-ties) and Q20-shaped accelerating-part supplier list
(correlated aggregate comparison as an exact integer test)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

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


def _write_dims(tmp_path):
    """One region/two nations/three suppliers; suppliers 1,2 in-region."""
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array([0, 1], pa.int32()),
                "r_name": pa.array(["EUROPE", "ASIA"]),
            }
        ),
        str(tmp_path / "region.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([0, 1], pa.int32()),
                "n_name": pa.array(["NATION_A", "NATION_B"]),
                "n_regionkey": pa.array([0, 1], pa.int32()),
            }
        ),
        str(tmp_path / "nation.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([1, 2, 3], pa.int64()),
                "s_name": pa.array(["S1", "S2", "S3"]),
                "s_acctbal": pa.array([100.0, 200.0, 300.0]),
                "s_nationkey": pa.array([0, 0, 1], pa.int32()),
            }
        ),
        str(tmp_path / "supplier.parquet"),
    )


class TestMinCostSupplier:
    def test_planted_min_with_ties(self, ray_session, tmp_path):
        from ocr_platform_ray.functions.relational import min_cost_supplier

        _write_dims(tmp_path)
        # part 10 qualifies; part 20 is the wrong type; part 30 too big
        pq.write_table(
            pa.table(
                {
                    "p_partkey": pa.array([10, 20, 30], pa.int64()),
                    "p_type": pa.array(["STANDARD", "PROMO", "STANDARD"]),
                    "p_size": pa.array([5, 5, 40], pa.int32()),
                }
            ),
            str(tmp_path / "part.parquet"),
        )
        # part 10: supp 1 min 3.00 (two lines 3.00/9.99), supp 2 min 3.00
        # (tie — BOTH kept), supp 3 cheaper but out-of-region (excluded)
        pq.write_table(
            pa.table(
                {
                    "l_partkey": pa.array(
                        [10, 10, 10, 10, 20, 30], pa.int64()
                    ),
                    "l_suppkey": pa.array([1, 1, 2, 3, 1, 1], pa.int64()),
                    "l_extendedprice": pa.array(
                        [3.0, 9.99, 3.0, 1.0, 2.0, 2.0]
                    ),
                }
            ),
            str(tmp_path / "lineitem.parquet"),
        )
        out = min_cost_supplier(
            str(tmp_path), region="EUROPE", part_type="STANDARD",
            max_size=15,
        ).to_pandas()
        assert len(out) == 2
        # sorted by s_acctbal DESC: S2 (200) before S1 (100)
        assert list(out["s_name"]) == ["S2", "S1"]
        assert list(out["min_cost"]) == [3.0, 3.0]
        assert set(out["p_partkey"]) == {10}
        assert set(out["n_name"]) == {"NATION_A"}

    def test_sf0001_matches_duckdb(self, ray_session):
        import __ray_entry__ as entry

        out = entry.queries()["q_min_cost_supplier"](SF).to_pandas()
        ref = _con().execute(entry.oracle_sql()["q_min_cost_supplier"]).df()
        pd.testing.assert_frame_equal(
            out.reset_index(drop=True), ref, check_dtype=False
        )
        assert len(out) > 0


class TestAcceleratingSuppliers:
    def test_planted_strict_half_boundary(self, ray_session, tmp_path):
        from ocr_platform_ray.functions.relational import (
            accelerating_part_suppliers,
        )

        _write_dims(tmp_path)
        pq.write_table(
            pa.table(
                {
                    "p_partkey": pa.array([10, 20], pa.int64()),
                    "p_name": pa.array(["red widget", "blue bolt"]),
                }
            ),
            str(tmp_path / "part.parquet"),
        )
        t97 = np.datetime64("1997-06-01", "us")
        t96 = np.datetime64("1996-06-01", "us")
        # supp 1 on part 10: 6 of 10 units in 1997 (2*6 > 10 -> in)
        # supp 2 on part 10: exactly half (2*5 == 10 -> OUT: strict >)
        # supp 1 on part 20: all in 1997 but the part isn't 'red ' (out)
        # supp 3: accelerating but out-of-nation (out)
        pq.write_table(
            pa.table(
                {
                    "l_partkey": pa.array(
                        [10, 10, 10, 10, 20, 10], pa.int64()
                    ),
                    "l_suppkey": pa.array([1, 1, 2, 2, 1, 3], pa.int64()),
                    "l_quantity": pa.array([6.0, 4.0, 5.0, 5.0, 9.0, 9.0]),
                    "l_shipdate": pa.array(
                        [t97, t96, t97, t96, t97, t97], pa.timestamp("us")
                    ),
                }
            ),
            str(tmp_path / "lineitem.parquet"),
        )
        out = accelerating_part_suppliers(
            str(tmp_path), nation="NATION_A", name_prefix="red ", year=1997
        ).to_pandas()
        assert list(out["s_name"]) == ["S1"]

    def test_sf0001_matches_duckdb(self, ray_session):
        import __ray_entry__ as entry

        out = entry.queries()["q_accelerating_suppliers"](SF).to_pandas()
        ref = _con().execute(
            entry.oracle_sql()["q_accelerating_suppliers"]
        ).df()
        pd.testing.assert_frame_equal(
            out.reset_index(drop=True), ref, check_dtype=False
        )


class TestSnapshotDiff:
    def test_planted_four_statuses(self, ray_session):
        from ocr_platform_ray.functions.joins import snapshot_diff

        a = pd.DataFrame(
            {
                "doc_id": np.array([1, 2, 3, 4], dtype=np.int64),
                "text": ["same", "old", "gone", "keep"],
                "source": ["s1", "s1", "s2", "s2"],
            }
        )
        b = pd.DataFrame(
            {
                "doc_id": np.array([1, 2, 4, 9], dtype=np.int64),
                "text": ["same", "new", "keep", "brand new"],
                "source": ["s1", "s1", "s2", "s2"],
            }
        )
        out = snapshot_diff(
            rd.from_pandas(a).repartition(3),
            rd.from_pandas(b).repartition(2),
        ).to_pandas()
        got = {
            (r["source"], r["status"]): int(r["n"])
            for _, r in out.iterrows()
        }
        assert got == {
            ("s1", "unchanged"): 1,
            ("s1", "changed"): 1,
            ("s2", "removed"): 1,
            ("s2", "unchanged"): 1,
            ("s2", "added"): 1,
        }

    def test_sf0001_matches_duckdb(self, ray_session):
        import __ray_entry__ as entry

        con = _con()
        con.execute(
            "CREATE VIEW documents AS SELECT *"
            f" FROM read_parquet('{SF}/documents.parquet')"
        )
        out = entry.queries()["q_snapshot_diff"](SF).to_pandas()
        ref = con.execute(entry.oracle_sql()["q_snapshot_diff"]).df()
        pd.testing.assert_frame_equal(
            _sorted(out), _sorted(ref), check_dtype=False
        )
        # every status present at sf0.001 (bucket probabilities ~10-20%)
        assert set(out["status"]) == {
            "added", "removed", "changed", "unchanged"
        }

    def test_randomized_matches_bruteforce(self, ray_session):
        import pytest

        from ocr_platform_ray.functions.joins import snapshot_diff

        for seed in (7, 42, 99):
            rng = np.random.default_rng(seed)
            texts = [f"t{i}" for i in range(6)]

            def snap():
                n = int(rng.integers(20, 120))
                ids = rng.choice(200, size=n, replace=False).astype(np.int64)
                return pd.DataFrame(
                    {
                        "doc_id": ids,
                        "text": rng.choice(texts, size=n),
                        "source": rng.choice(["sA", "sB", "sC"], size=n),
                    }
                )

            a, b = snap(), snap()
            out = snapshot_diff(
                rd.from_pandas(a).repartition(4),
                rd.from_pandas(b).repartition(3),
            ).to_pandas()
            m = a.merge(b, on="doc_id", how="outer", suffixes=("_a", "_b"))
            status = np.where(
                m["text_a"].isna(), "added",
                np.where(
                    m["text_b"].isna(), "removed",
                    np.where(m["text_a"] != m["text_b"],
                             "changed", "unchanged"),
                ),
            )
            ref = (
                pd.DataFrame(
                    {
                        "source": m["source_a"].fillna(m["source_b"]),
                        "status": status,
                    }
                )
                .groupby(["source", "status"], as_index=False)
                .size()
                .rename(columns={"size": "n"})
            )
            got = _sorted(out)
            want = _sorted(ref)
            pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestLeakageSafeSplit:
    def test_duplicates_coassigned_and_head_keyed(self, ray_session):
        from ocr_platform_ray.functions.dedup import (
            leakage_safe_split,
            train_test_split,
        )

        # ids 5 and 77 share a text -> both get the split of cluster
        # head 5; singleton 9 splits exactly like train_test_split(9)
        docs = pd.DataFrame(
            {
                "doc_id": np.array([5, 77, 9], dtype=np.int64),
                "text": ["dup text", "dup text", "unique text"],
            }
        )
        out = leakage_safe_split(
            rd.from_pandas(docs).repartition(3)
        ).to_pandas()
        got = dict(zip(out["doc_id"], out["split"]))
        assert got[5] == got[77]
        ref = train_test_split(
            rd.from_pandas(docs[docs.doc_id.isin([5, 9])])
        ).to_pandas()
        head = dict(zip(ref["doc_id"], ref["split"]))
        assert got[5] == head[5] and got[9] == head[9]

    def test_sf01_no_cross_split_dup_pairs(self, ray_session):
        """The guarantee itself, on the only sf with real dup texts:
        zero exact-duplicate pairs straddle a split boundary."""
        import duckdb

        from ocr_platform_ray.functions.dedup import leakage_safe_split

        sf = "/root/testdata/sf0.1"
        out = leakage_safe_split(
            rd.read_parquet(f"{sf}/documents.parquet",
                            columns=["doc_id", "text"])
        ).to_pandas()
        con = duckdb.connect()
        con.register("assign", out)
        con.execute(
            "CREATE VIEW d AS SELECT * FROM"
            f" read_parquet('{sf}/documents.parquet')"
        )
        n_dup_pairs, n_leaked = con.execute(
            "SELECT count(*),"
            " sum(CASE WHEN sa.split <> sb.split THEN 1 ELSE 0 END)"
            " FROM d a JOIN d b ON a.text = b.text"
            " AND a.doc_id < b.doc_id"
            " JOIN assign sa ON sa.doc_id = a.doc_id"
            " JOIN assign sb ON sb.doc_id = b.doc_id"
        ).fetchone()
        assert n_dup_pairs > 0          # the sf actually has dup pairs
        assert int(n_leaked) == 0

    def test_neardup_pairs_coassigned_sf0001(self, ray_session):
        """Every MinHash candidate pair lands on one side of the
        near-dup leakage-safe split."""
        import __ray_entry__ as entry

        q = entry.queries()
        split = q["q_leakage_split_neardup"](SF).to_pandas()
        pairs = q["q_minhash_pairs"](SF).to_pandas()
        lk = dict(zip(split["doc_id"], split["split"]))
        assert len(split) == 500
        assert len(pairs) > 0
        for _, r in pairs.iterrows():
            assert lk[r["doc_a"]] == lk[r["doc_b"]]

    def test_component_labels_two_path_equality(self, ray_session):
        """Driver union-find and distributed propagation produce
        identical (doc_id, label) rows on the sf0.001 pair set."""
        from ocr_platform_ray.functions import dedup

        docs = rd.read_parquet(
            f"{SF}/documents.parquet", columns=["doc_id", "text"]
        )
        pairs = dedup.minhash_dup_pairs(docs, threshold=0.7).map_batches(
            lambda t: t.select(["doc_a", "doc_b"]), batch_format="pyarrow"
        )
        a = (
            dedup.component_labels(pairs, cc_mode="driver")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        b = (
            dedup.component_labels(pairs, cc_mode="distributed")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert len(a) > 0
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
