"""Gopher document-statistics gate + temperature-scaled mixture weights.

The synthetic corpus is single-line lowercase word soup, so the driver
oracle never exercises bullets/ellipses/symbols/keep=true — these planted
tests do.
"""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def _rules(texts):
    from ocr_platform_ray.functions.textstats import gopher_rules_batch

    t = gopher_rules_batch(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    )
    return t.to_pandas().set_index("doc_id")


class TestGopherRules:
    def test_word_and_length_signals(self):
        r = _rules(["aa bb cc", ""])
        assert r.loc[0, "n_words"] == 3
        assert r.loc[0, "mean_word_len"] == 2.0
        assert r.loc[1, "n_words"] == 0
        assert r.loc[1, "mean_word_len"] == 0.0

    def test_symbol_ratio_counts_hash_and_both_ellipses(self):
        # 2 words; one '#', one unicode ellipsis, one three-dot run
        r = _rules(["a# b… ...", "clean text"])
        assert r.loc[0, "symbol_ratio"] == round(3 / 3, 6)
        assert r.loc[1, "symbol_ratio"] == 0.0

    def test_alpha_word_ratio(self):
        r = _rules(["abc 123 a1 42"])
        # 'abc' and 'a1' contain letters; '123', '42' do not
        assert r.loc[0, "alpha_word_ratio"] == 0.5

    def test_bullet_and_ellipsis_lines(self):
        text = "- item one\n  * item two\nplain line\nto be continued..."
        r = _rules([text])
        assert r.loc[0, "bullet_line_ratio"] == 0.5
        assert r.loc[0, "ellipsis_line_ratio"] == 0.25

    def test_bullet_anchor_does_not_cross_lines(self):
        # blank lines before a bullet: per-line semantics count ONE
        # bullet line out of three, not a multiline '^\s*-' match
        r = _rules(["\n\n- x"])
        assert r.loc[0, "bullet_line_ratio"] == round(1 / 3, 6)

    def test_stopword_hits_whole_words_only(self):
        r = _rules(["the cat sat with another cat", "theory tot of"])
        assert r.loc[0, "stopword_hits"] == 2  # the, with
        assert r.loc[1, "stopword_hits"] == 1  # of ('theory'/'tot' no)

    def test_keep_decision(self):
        good = " ".join(["the", "be"] + ["word"] * 60)
        short = "the be word"  # < 50 words
        r = _rules([good, short])
        assert bool(r.loc[0, "gopher_keep"]) is True
        assert bool(r.loc[1, "gopher_keep"]) is False


class TestTemperatureWeights:
    def test_closed_form(self, ray_session):
        from ocr_platform_ray.functions.textstats import temperature_weights

        df = pd.DataFrame(
            {
                "lang": ["en"] * 8 + ["vi"] * 2,
                "text": ["a b c d"] * 8 + ["a b"] * 2,
            }
        )
        out = temperature_weights(rd.from_pandas(df), tau=0.7).to_pandas()
        out = out.set_index("lang")
        assert out.loc["en", "n_tokens"] == 32
        assert out.loc["vi", "n_tokens"] == 4
        p_en, p_vi = 32 / 36, 4 / 36
        z = p_en**0.7 + p_vi**0.7
        r6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6
        assert out.loc["en", "weight"] == r6(p_en**0.7 / z)
        assert out.loc["vi", "weight"] == r6(p_vi**0.7 / z)
        # tau < 1 upsamples the low-resource group
        assert out.loc["vi", "upsample"] > 1.0 > out.loc["en", "upsample"]
        assert abs(out["weight"].sum() - 1.0) < 1e-5

    def test_partitioning_invariance(self, ray_session):
        from ocr_platform_ray.functions.textstats import temperature_weights

        rng = np.random.RandomState(7)
        df = pd.DataFrame(
            {
                "lang": rng.choice(["en", "fr", "de"], 200),
                "text": [
                    " ".join(rng.choice(["aa", "bb", "cc"], rng.randint(1, 9)))
                    for _ in range(200)
                ],
            }
        )
        base = None
        for nblocks in (1, 13):
            got = (
                temperature_weights(rd.from_pandas(df).repartition(nblocks))
                .to_pandas()
                .sort_values("lang")
                .reset_index(drop=True)
            )
            if base is None:
                base = got
            else:
                pd.testing.assert_frame_equal(got, base)

    def test_max_groups_guard(self, ray_session):
        from ocr_platform_ray.functions.textstats import temperature_weights

        df = pd.DataFrame(
            {"lang": [f"l{i}" for i in range(50)], "text": ["a"] * 50}
        )
        with pytest.raises(ValueError, match="max_groups"):
            temperature_weights(rd.from_pandas(df), max_groups=10)
