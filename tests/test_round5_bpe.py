"""BPE training (dictionary merge loop) and distributed encoding."""

import numpy as np
import pandas as pd

import ray.data as rd


class TestBpeTrain:
    def test_planted_merge_sequence(self, ray_session):
        from ocr_platform_ray.functions.bpe import bpe_train

        # vocab: aaab x2, ab x1
        # round 0: (a,a)=4  round 1: (a,b)=3  round 2: (aa,ab)=2, then
        # every word is a single symbol -> early stop
        ds = rd.from_pandas(pd.DataFrame({"text": ["aaab aaab ab"]}))
        out = bpe_train(ds, n_merges=10).to_pandas()
        got = list(zip(out["left"], out["right"], out["n"]))
        assert got == [("a", "a", 4), ("a", "b", 3), ("aa", "ab", 2)]
        assert list(out["rank"]) == [0, 1, 2]

    def test_tie_break_lexicographic(self, ray_session):
        from ocr_platform_ray.functions.bpe import bpe_train

        # pairs (x,y) and (a,b) both appear twice -> (a,b) merges first
        ds = rd.from_pandas(pd.DataFrame({"text": ["xy xy ab ab"]}))
        out = bpe_train(ds, n_merges=1).to_pandas()
        assert (out.loc[0, "left"], out.loc[0, "right"]) == ("a", "b")

    def test_singleton_pairs_not_merged(self, ray_session):
        from ocr_platform_ray.functions.bpe import bpe_train

        ds = rd.from_pandas(pd.DataFrame({"text": ["abc xyz"]}))
        assert len(bpe_train(ds, n_merges=5)) == 0

    def test_max_dict_guard(self, ray_session):
        from ocr_platform_ray.functions.bpe import bpe_train

        ds = rd.from_pandas(
            pd.DataFrame({"text": [" ".join(f"w{i}" for i in range(30))]})
        )
        import pytest

        with pytest.raises(ValueError, match="max_dict"):
            bpe_train(ds, max_dict=10)


class TestEncodeWord:
    def test_lowest_rank_first(self):
        from ocr_platform_ray.functions.bpe import encode_word

        ranks = {("a", "a"): 0, ("a", "b"): 1, ("aa", "ab"): 2}
        assert encode_word("aaab", ranks) == ["aaab"]
        assert encode_word("aab", ranks) == ["aa", "b"]
        assert encode_word("ba", ranks) == ["b", "a"]
        assert encode_word("", ranks) == []


class TestBpeEncodeCounts:
    def test_matches_per_word_reference(self, ray_session):
        from ocr_platform_ray.functions.bpe import (
            bpe_encode_counts, bpe_train, encode_word)

        rng = np.random.RandomState(5)
        vocab = ["alpha", "beta", "gamma", "alphabet", "bet"]
        df = pd.DataFrame(
            {
                "doc_id": np.arange(50, dtype=np.int64),
                "text": [
                    " ".join(rng.choice(vocab, rng.randint(0, 8)))
                    for _ in range(50)
                ],
            }
        )
        ds = rd.from_pandas(df)
        merges = bpe_train(ds, n_merges=6)
        ranks = {
            (l, r): i
            for i, (l, r) in enumerate(
                zip(merges.column("left").to_pylist(),
                    merges.column("right").to_pylist())
            )
        }
        import re

        want = {}
        for d, t in zip(df["doc_id"], df["text"]):
            ws = re.findall(r"[a-z0-9]+", t)
            want[d] = (len(ws), sum(len(encode_word(w, ranks)) for w in ws))
        for nblocks in (1, 7):
            got = {
                r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
                for r in bpe_encode_counts(
                    ds.repartition(nblocks), merges
                ).take_all()
            }
            assert got == want

    def test_empty_doc_present_with_zero(self, ray_session):
        from ocr_platform_ray.functions.bpe import bpe_encode_counts, bpe_train

        ds = rd.from_pandas(
            pd.DataFrame({"doc_id": [0, 1], "text": ["aa aa", ""]})
        )
        out = {
            r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
            for r in bpe_encode_counts(ds, bpe_train(ds)).take_all()
        }
        assert out[0] == (2, 2)  # 'aa' merged to one symbol... if merged
        assert out[1] == (0, 0)
