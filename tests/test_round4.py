"""Round-4 additions: top-N + OOV LM scoring, fraction-edge train/test
split, empty-block quantile partials, sliced span batches."""

import math

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from ocr_platform_ray.functions import dedup, textstats
from ocr_platform_ray.functions.sketches import exact_quantile
from ocr_platform_ray.functions.textstats import TOKEN_RE


def _docs(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def _ref_lm_topn(rows, top_n):
    """Single-process reference of the top-N + OOV unigram model."""
    import re

    counts: dict[str, int] = {}
    doc_toks = {}
    for doc_id, text in rows:
        toks = re.findall(TOKEN_RE, text)
        doc_toks[doc_id] = toks
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
    n_total = sum(counts.values())
    v = len(counts)
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top_n]
    top_d = dict(top)
    denom = n_total + v
    if v > len(top):
        c_oov = (n_total - sum(top_d.values())) / (v - len(top))
        lp_oov = math.log((c_oov + 1.0) / denom)
    else:
        lp_oov = None
    out = {}
    for doc_id, toks in doc_toks.items():
        if not toks:
            continue
        lps = [
            math.log((top_d[t] + 1.0) / denom) if t in top_d else lp_oov
            for t in toks
        ]
        out[doc_id] = (
            math.floor(float(np.mean(lps)) * 1e6 + 0.5) / 1e6,
            len(toks),
        )
    return out


class TestLmTopN:
    ROWS = [
        (i, " ".join(f"w{(i * 7 + j) % 40}" for j in range(12)) + " common token")
        for i in range(30)
    ]

    def test_exact_raises_past_max_vocab_topn_completes(self):
        # vocabulary (~42 tokens) exceeds a tiny max_vocab: the exact
        # variant refuses loudly, the top-N variant completes
        with pytest.raises(ValueError, match="max_vocab"):
            textstats.unigram_logprob_batchfn(_docs(self.ROWS), max_vocab=10)
        out = textstats.unigram_logprob_topn(_docs(self.ROWS), top_n=10)
        got = {
            r["doc_id"]: (r["mean_logprob"], r["n_tok"]) for r in out.take_all()
        }
        assert got == _ref_lm_topn(self.ROWS, 10)

    def test_topn_covering_vocab_equals_exact(self):
        # when top_n >= |V| there are no OOV tokens: identical to exact
        exact = {
            r["doc_id"]: (r["mean_logprob"], r["n_tok"])
            for r in textstats.unigram_logprob_batchfn(_docs(self.ROWS)).take_all()
        }
        topn = {
            r["doc_id"]: (r["mean_logprob"], r["n_tok"])
            for r in textstats.unigram_logprob_topn(
                _docs(self.ROWS), top_n=10_000
            ).take_all()
        }
        assert topn == exact

    def test_partitioning_invariance(self):
        a = textstats.unigram_logprob_topn(
            _docs(self.ROWS).repartition(1), top_n=10
        ).take_all()
        b = textstats.unigram_logprob_topn(
            _docs(self.ROWS).repartition(7), top_n=10
        ).take_all()
        key = lambda r: r["doc_id"]  # noqa: E731
        assert sorted(a, key=key) == sorted(b, key=key)


class TestTrainTestSplitEdges:
    def test_fractions_summing_to_one(self):
        # (0.9, 0.1): cut2 == 256 used to format as '100' and
        # lexicographically misclassify most rows as test
        ds = _docs([(i, "x") for i in range(400)])
        out = dedup.train_test_split(ds, fractions=(0.9, 0.1)).take_all()
        from ocr_platform_ray.md5np import md5_hex

        for r in out:
            b = int(
                md5_hex(pa.array([str(r["doc_id"])])).to_pylist()[0][:2], 16
            )
            assert r["split"] == ("train" if b < 230 else "valid")
        assert not any(r["split"] == "test" for r in out)

    def test_all_train(self):
        ds = _docs([(i, "x") for i in range(50)])
        out = dedup.train_test_split(ds, fractions=(1.0, 0.0)).take_all()
        assert all(r["split"] == "train" for r in out)

    def test_invalid_fractions_raise(self):
        ds = _docs([(1, "x")])
        with pytest.raises(ValueError, match="fractions"):
            dedup.train_test_split(ds, fractions=(0.9, 0.2))


class TestExactQuantileEmptyBlocks:
    def test_filter_created_empty_blocks(self):
        # a filter that empties some blocks used to crash the lo/hi merge
        # with None partials
        vals = list(np.linspace(0.0, 100.0, 101))
        t = pa.table({"v": pa.array(vals, pa.float64())})
        ds = rd.from_arrow(t).repartition(8).filter(expr="v >= 50")
        got = exact_quantile(ds, "v", 0.5)
        assert got == float(np.quantile(np.array(vals)[50:], 0.5))


class TestSlicedSpanBatch:
    def test_spans_flat_on_sliced_batch(self):
        # _spans_flat must renormalize offsets when handed a zero-copy
        # slice whose child array extends beyond the slice
        from ocr_platform_ray.stages.extract import _spans_flat

        spans_type = pa.list_(
            pa.struct(
                [
                    ("kind", pa.string()),
                    ("text", pa.string()),
                    ("media_ref", pa.string()),
                    ("offset", pa.int32()),
                ]
            )
        )
        rows = [
            [
                {
                    "kind": "text",
                    "text": f"d{i}s{j}",
                    "media_ref": "",
                    "offset": j,
                }
                for j in range(3)
            ]
            for i in range(6)
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array([f"d{i}" for i in range(6)]),
                "spans": pa.array(rows, spans_type),
            }
        )
        sl = tbl.slice(2, 3)
        off, kinds, texts, refs, offs = _spans_flat(sl)
        assert off[0] == 0 and off[-1] == len(kinds) == 9
        assert texts[0] == "d2s0" and texts[-1] == "d4s2"
