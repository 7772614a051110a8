"""Round-5 batch-4 operators pinned against brute-force references on
adversarial partitionings: the pair-vectorized byte-Levenshtein kernel,
blocked edit-distance pairs, length-island connected components (chain
topology through the real distributed label propagation), per-group
mode, md5 group fingerprints, and the zlib compression audit."""

import hashlib
import random
import zlib

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


def _lev_ref(a: bytes, b: bytes) -> int:
    prev = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        cur = [i] + [0] * len(b)
        for j in range(1, len(b) + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[len(b)]


class TestLevenshteinKernel:
    def test_matches_bruteforce_incl_multibyte_and_empty(self):
        from ocr_platform_ray.functions.linkage import levenshtein_bytes_block

        rng = random.Random(7)
        alpha = "abcdé日x "
        cases = [
            (
                "".join(rng.choice(alpha) for _ in range(rng.randint(0, 40))),
                "".join(rng.choice(alpha) for _ in range(rng.randint(0, 40))),
            )
            for _ in range(120)
        ]
        cases += [("", ""), ("", "abc"), ("xyz", ""), ("same", "same")]
        A = [a.encode("utf-8") for a, _ in cases]
        B = [b.encode("utf-8") for _, b in cases]
        got = levenshtein_bytes_block(A, B)
        want = np.array([_lev_ref(a, b) for a, b in zip(A, B)])
        assert (got == want).all()

    def test_empty_input(self):
        from ocr_platform_ray.functions.linkage import levenshtein_bytes_block

        assert len(levenshtein_bytes_block([], [])) == 0


def _pair_df(n=120, seed=23):
    rng = np.random.RandomState(seed)
    base = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "日本語のテキストが混ざるケース",
    ]
    texts = []
    for i in range(n):
        t = base[i % 3]
        # small edits so near-dup pairs exist inside blocks
        if rng.rand() < 0.5:
            t = t.replace("o", "0", rng.randint(1, 3))
        texts.append(t + " " + str(rng.randint(0, 4)))
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": rng.choice(["en", "ja"], n),
            "source": rng.choice(["s0", "s1"], n),
            "n_chars": np.array([len(t) for t in texts], np.int64),
        }
    )


class TestEditDistancePairs:
    def test_matches_bruteforce(self, ray_session):
        from ocr_platform_ray.functions.linkage import edit_distance_pairs

        df = _pair_df()
        out = (
            edit_distance_pairs(
                rd.from_pandas(df).repartition(11), ["lang", "source"]
            )
            .to_pandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
        rows = []
        by_block = df.groupby(
            ["lang", "source", df["n_chars"] // 10], sort=False
        )
        for _, sub in by_block:
            sub = sub.sort_values("doc_id")
            recs = list(sub.itertuples())
            for i in range(len(recs)):
                for j in range(i + 1, len(recs)):
                    a = recs[i].text.encode("utf-8")
                    b = recs[j].text.encode("utf-8")
                    d = _lev_ref(a, b)
                    mx = max(len(a), len(b))
                    rows.append(
                        (recs[i].doc_id, recs[j].doc_id, d, 1 - d / mx)
                    )
        ref = (
            pd.DataFrame(rows, columns=["doc_a", "doc_b", "dist", "sim"])
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
        assert len(out) == len(ref) > 0
        assert (out["doc_a"].to_numpy() == ref["doc_a"].to_numpy()).all()
        assert (out["dist"].to_numpy() == ref["dist"].to_numpy()).all()
        assert np.allclose(out["sim"], ref["sim"], atol=1e-6)

    def test_pair_guard_fires(self, ray_session):
        from ocr_platform_ray.functions.linkage import edit_distance_pairs

        df = _pair_df(80)
        df["lang"] = "en"
        df["source"] = "s"
        df["n_chars"] = 50  # one giant block
        with pytest.raises(ValueError, match="edit_distance_pairs"):
            edit_distance_pairs(
                rd.from_pandas(df), ["lang", "source"],
                max_pairs_per_bucket=100,
            ).materialize()


class TestLengthIslands:
    def test_matches_island_reference(self, ray_session):
        from ocr_platform_ray.functions.linkage import length_island_components

        rng = np.random.RandomState(31)
        n = 300
        df = pd.DataFrame(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "lang": rng.choice(["en", "fr"], n),
                "source": rng.choice(["a", "b", "c"], n),
                # few buckets -> long multi-hop runs exercise propagation
                "n_chars": (rng.randint(0, 3, n) * 100 + 50).astype(np.int64),
            }
        )
        out = (
            length_island_components(rd.from_pandas(df).repartition(9))
            .to_pandas()
            .set_index("doc_id")["component"]
        )
        ref = {}
        for _, sub in df.groupby(["lang", "source"], sort=False):
            sub = sub.sort_values("doc_id")
            ids = sub["doc_id"].to_numpy()
            lb = sub["n_chars"].to_numpy() // 100
            comp = ids[0]
            for k, i in enumerate(ids):
                if k > 0 and lb[k] != lb[k - 1]:
                    comp = i
                ref[i] = comp
        assert len(out) == n
        for i, c in ref.items():
            assert out[i] == c, (i, out[i], c)

    def test_driver_and_distributed_paths_agree(self, ray_session):
        from ocr_platform_ray.functions.linkage import length_island_components

        rng = np.random.RandomState(47)
        n = 200
        df = pd.DataFrame(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "lang": rng.choice(["en", "fr"], n),
                "source": rng.choice(["a", "b"], n),
                "n_chars": (rng.randint(0, 2, n) * 100 + 50).astype(np.int64),
            }
        )
        ds = rd.from_pandas(df).repartition(7)
        drv = (
            length_island_components(ds, cc_mode="driver")
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        dst = (
            length_island_components(ds, cc_mode="distributed")
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(drv, dst)

    def test_singletons_label_themselves(self, ray_session):
        from ocr_platform_ray.functions.linkage import length_island_components

        df = pd.DataFrame(
            {
                "doc_id": np.arange(4, dtype=np.int64),
                "lang": ["en"] * 4,
                "source": ["a"] * 4,
                # alternating buckets: no edges at all
                "n_chars": np.array([50, 250, 50, 250], np.int64),
            }
        )
        out = (
            length_island_components(rd.from_pandas(df).repartition(3))
            .to_pandas()
            .sort_values("doc_id")
        )
        assert (out["component"].to_numpy() == out["doc_id"].to_numpy()).all()


class TestModeByGroup:
    def test_matches_bruteforce_with_ties(self, ray_session):
        from ocr_platform_ray.functions.relational import mode_by_group

        rng = np.random.RandomState(13)
        n = 700
        df = pd.DataFrame(
            {
                "user_id": rng.randint(0, 40, n).astype(np.int64),
                "event_type": rng.choice(["view", "click", "buy"], n),
            }
        )
        out = (
            mode_by_group(
                rd.from_pandas(df).repartition(9), "user_id", "event_type"
            )
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        cnt = df.groupby(["user_id", "event_type"], as_index=False).size()
        ref = (
            cnt.sort_values(
                ["user_id", "size", "event_type"],
                ascending=[True, False, True],
                kind="mergesort",
            )
            .drop_duplicates("user_id")
            .rename(columns={"size": "n"})
            .reset_index(drop=True)
        )
        ref["n"] = ref["n"].astype(np.int64)
        pd.testing.assert_frame_equal(out[["user_id", "event_type", "n"]], ref)


class TestGroupFingerprint:
    def test_matches_hashlib(self, ray_session):
        from ocr_platform_ray.functions.sketches import group_fingerprint

        rng = np.random.RandomState(5)
        n = 250
        texts = ["text-" + "x" * rng.randint(0, 120) + str(i % 37)
                 for i, _ in enumerate(range(n))]
        df = pd.DataFrame(
            {"source": rng.choice(["a", "b", "c"], n), "text": texts}
        )
        out = (
            group_fingerprint(
                rd.from_pandas(df).repartition(8), "source", "text"
            )
            .to_pandas()
            .set_index("source")
        )
        for g, sub in df.groupby("source"):
            want = sum(
                int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
                for t in sub["text"]
            )
            assert out.loc[g, "checksum"] == want
            assert out.loc[g, "n_rows"] == len(sub)

    def test_partition_invariant(self, ray_session):
        from ocr_platform_ray.functions.sketches import group_fingerprint

        df = pd.DataFrame(
            {"source": ["a", "b"] * 50, "text": [f"t{i}" for i in range(100)]}
        )
        a = (
            group_fingerprint(rd.from_pandas(df).repartition(2), "source", "text")
            .to_pandas().sort_values("source").reset_index(drop=True)
        )
        b = (
            group_fingerprint(rd.from_pandas(df).repartition(17), "source", "text")
            .to_pandas().sort_values("source").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)


class TestCompressionStats:
    def test_matches_direct_zlib(self, ray_session):
        from ocr_platform_ray.functions.textstats import compression_stats

        rng = np.random.RandomState(3)
        texts = [
            ("repeat " * rng.randint(1, 30)) + str(i) for i in range(150)
        ]
        df = pd.DataFrame(
            {"source": rng.choice(["a", "b"], 150), "text": texts}
        )
        out = (
            compression_stats(rd.from_pandas(df).repartition(7))
            .to_pandas()
            .set_index("source")
        )
        for g, sub in df.groupby("source"):
            raw = sum(len(t.encode()) for t in sub["text"])
            comp = sum(len(zlib.compress(t.encode(), 6)) for t in sub["text"])
            hi = sum(
                100 * len(zlib.compress(t.encode(), 6)) < 35 * len(t.encode())
                for t in sub["text"]
            )
            assert out.loc[g, "raw_bytes"] == raw
            assert out.loc[g, "comp_bytes"] == comp
            assert out.loc[g, "n_highly_compressible"] == hi
            assert out.loc[g, "compression_ratio"] == pytest.approx(
                comp / raw, abs=1e-6
            )
