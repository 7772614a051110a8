"""train_test_split + pack_sequences: determinism, invariants, guards."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from ocr_platform_ray.functions import dedup, packing

SF = "/root/testdata/sf0.001"


def _docs_ds():
    return rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])


class TestTrainTestSplit:
    def test_ratios_and_determinism(self, ray_session):
        out = dedup.train_test_split(_docs_ds().select_columns(["doc_id"]))
        df = out.to_pandas()
        frac = df["split"].value_counts(normalize=True)
        # md5 is uniform: 80/10/10 within a loose tolerance at n=500
        assert 0.7 < frac["train"] < 0.9
        assert frac.get("valid", 0) > 0 and frac.get("test", 0) > 0
        # repartitioning must not move any row between splits
        df2 = (
            dedup.train_test_split(
                _docs_ds().select_columns(["doc_id"]).repartition(7)
            )
            .to_pandas()
        )
        merged = df.merge(df2, on="doc_id", suffixes=("_a", "_b"))
        assert (merged["split_a"] == merged["split_b"]).all()

    def test_matches_hashlib_contract(self, ray_session):
        import hashlib

        df = dedup.train_test_split(_docs_ds().select_columns(["doc_id"])).to_pandas()
        for _, row in df.sample(20, random_state=0).iterrows():
            b = hashlib.md5(str(row["doc_id"]).encode()).hexdigest()[:2]
            want = "train" if b < "cc" else ("valid" if b < "e6" else "test")
            assert row["split"] == want


class TestPackBoundaries:
    def test_greedy_fill(self):
        starts = packing._pack_boundaries(np.array([100, 200, 300, 100]), 512)
        # 100+200 <= 512, +300 would exceed -> [0..1], [2..3]
        assert starts.tolist() == [0, 2]

    def test_oversize_doc_gets_own_sequence(self):
        starts = packing._pack_boundaries(np.array([600, 10, 700, 10]), 512)
        assert starts.tolist() == [0, 1, 2, 3]

    def test_exact_fit(self):
        starts = packing._pack_boundaries(np.array([512, 512]), 512)
        assert starts.tolist() == [0, 1]

    def test_matches_naive_loop(self):
        rng = np.random.RandomState(7)
        tokens = rng.randint(1, 300, size=200)
        starts = packing._pack_boundaries(tokens, 512).tolist()
        naive, acc = [0], 0
        for i, t in enumerate(tokens):
            if i == 0:
                acc = t
                continue
            if acc + t > 512:
                naive.append(i)
                acc = t
            else:
                acc += t
        assert starts == naive


class TestPackSequences:
    def _packed(self):
        from ocr_platform_ray.functions import textstats

        docs = (
            _docs_ds()
            .map_batches(textstats.token_count_batch, batch_format="pyarrow")
            .select_columns(["doc_id", "n_tokens"])
        )
        return packing.pack_sequences(docs, max_tokens=512)

    def test_invariants(self, ray_session):
        df = self._packed().to_pandas()
        assert df["doc_id"].is_unique and len(df) == 500
        g = df.groupby("seq_id")
        assert (g["n_tokens"].sum() == g["seq_tokens"].first()).all()
        multi = g.size() > 1
        assert (g["seq_tokens"].first()[multi] <= 512).all()
        # positions are 0..len-1 within each sequence
        assert (g["seq_pos"].min() == 0).all()
        assert (g["seq_pos"].max() == g.size() - 1).all()

    def test_partitioning_invariance(self, ray_session):
        from ocr_platform_ray.functions import textstats

        docs = (
            _docs_ds()
            .map_batches(textstats.token_count_batch, batch_format="pyarrow")
            .select_columns(["doc_id", "n_tokens"])
        )
        a = packing.pack_sequences(docs, max_tokens=512).to_pandas()
        b = packing.pack_sequences(docs.repartition(5), max_tokens=512).to_pandas()
        a = a.sort_values("doc_id").reset_index(drop=True)
        b = b.sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


class TestJaccardGuard:
    def test_candidate_cap_raises(self, ray_session):
        with pytest.raises(ValueError, match="candidate"):
            dedup.ngram_jaccard_dup_pairs(
                _docs_ds(), threshold=0.8, candidate_threshold=0.5,
                max_candidate_pairs=1,
            )

    def test_empty_candidates(self, ray_session):
        # impossible threshold -> no candidates -> typed empty result
        out = dedup.ngram_jaccard_dup_pairs(
            _docs_ds(), threshold=0.8, candidate_threshold=1.01
        )
        # schema survives on the Dataset even with zero rows (Ray's
        # to_pandas drops columns for empty datasets, so assert there)
        assert out.schema().names == ["doc_a", "doc_b", "jaccard"]
        assert out.count() == 0

    def test_jaccard_values_exact(self, ray_session):
        """Spot-check the exact Jaccard against a naive shingle-set calc."""
        out = dedup.ngram_jaccard_dup_pairs(
            _docs_ds(), threshold=0.8, candidate_threshold=0.5
        ).to_pandas()
        assert len(out) > 0
        texts = (
            rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
            .to_pandas()
            .set_index("doc_id")["text"]
        )
        for _, row in out.head(5).iterrows():
            sa = set(dedup.shingles_of(texts[row["doc_a"]], 3))
            sb = set(dedup.shingles_of(texts[row["doc_b"]], 3))
            want = round(len(sa & sb) / len(sa | sb), 6)
            assert row["jaccard"] == want and want >= 0.8
