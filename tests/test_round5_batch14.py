"""Planted pins for the round-5 batch-14 audits: categorical mutual
information (source x lang association), hapax/vocabulary richness per
slice, and cross-type lead-lag correlation. Registry equality at sf0.01
and sf0.1 is swept by tools/check_correctness.py."""

import math

import numpy as np
import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.events import xcorr_daily
from ocr_platform_ray.functions.relational import categorical_mutual_info
from ocr_platform_ray.functions.textstats import hapax_by_group

DAY_US = 86_400_000_000


def _mi(rows):
    t = pa.table(
        {
            "a": pa.array([r[0] for r in rows], pa.string()),
            "b": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    return categorical_mutual_info(rd.from_arrow(t), "a", "b").to_pandas()


def test_mi_perfect_association_is_marginal_entropy():
    # a determines b one-to-one over a uniform 4-way split:
    # MI = H(a) = H(b) = 2 bits, NMI = 1
    rows = [(c, c.upper()) for c in "wxyz" for _ in range(5)]
    out = _mi(rows)
    assert out["n_cells"].tolist() == [4]
    assert out["mi_bits"].tolist() == [2.0]
    assert out["h_a_bits"].tolist() == [2.0]
    assert out["h_b_bits"].tolist() == [2.0]
    assert out["nmi"].tolist() == [1.0]


def test_mi_independence_is_zero():
    # balanced product distribution: every (a, b) cell equally likely
    rows = [(a, b) for a in "pq" for b in "uv" for _ in range(3)]
    out = _mi(rows)
    assert out["mi_bits"].tolist() == [0.0]
    assert out["h_a_bits"].tolist() == [1.0]
    assert out["nmi"].tolist() == [0.0]


def test_mi_degenerate_single_category():
    # constant a AND constant b: both entropies 0 -> NMI undefined
    out = _mi([("k", "m")] * 7)
    assert out["mi_bits"].tolist() == [0.0]
    assert math.isnan(out["nmi"].iloc[0])


def test_hapax_planted():
    # src A: "a a b" -> occ 3, distinct 2, hapax 1 (b); TTR 2/3
    # src B: "c d d e" -> occ 4, distinct 3, hapax 2 (c, e)
    t = pa.table(
        {
            "source": pa.array(["A", "A", "B"], pa.string()),
            "text": pa.array(["a a", "b", "c d d e"], pa.string()),
        }
    )
    out = hapax_by_group(rd.from_arrow(t), "source").to_pandas()
    got = {
        r.source: (
            int(r.n_occurrences),
            int(r.n_distinct),
            int(r.n_hapax),
            r.hapax_share,
            r.ttr,
        )
        for r in out.itertuples()
    }
    assert got["A"] == (3, 2, 1, 0.5, round(2.0 / 3.0, 6))
    assert got["B"] == (4, 3, 2, round(2.0 / 3.0, 6), 0.75)


def test_hapax_cross_batch_merge():
    """A token split across many input blocks must count as ONE
    vocabulary entry (the bucketed merge, not per-batch counts): 64
    single-doc blocks all containing 'common' -> not a hapax."""
    docs = ["common"] * 64 + ["rare%d" % i for i in range(5)]
    t = pa.table(
        {
            "source": pa.array(["s"] * len(docs), pa.string()),
            "text": pa.array(docs, pa.string()),
        }
    )
    ds = rd.from_arrow(t).repartition(16)
    out = hapax_by_group(ds, "source").to_pandas()
    assert int(out["n_distinct"].iloc[0]) == 6
    assert int(out["n_hapax"].iloc[0]) == 5


def _events(rows):
    return rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "ts": pa.array(
                    [r[1] * DAY_US + 1 for r in rows], pa.timestamp("us")
                ),
            }
        )
    )


def test_xcorr_planted_lead_lag():
    """b is a's pattern shifted 2 days later (a spikes on even days,
    b on the same parity offset by 2): corr(a_t, b_{t-2}) == 1 at
    lag 2 exactly, and the (a, b) direction differs from (b, a)."""
    rows = []
    for d in range(10):
        rows += [("a", d)] * (5 if d % 4 == 0 else 1)
        rows += [("b", d)] * (5 if d % 4 == 2 else 1)
    out = xcorr_daily(_events(rows), max_lag=3).to_pandas()
    got = {
        (r.type_a, r.type_b, int(r.lag)): r.xcorr
        for r in out.itertuples()
    }
    # a at day d vs b at day d-2: a spikes d%4==0, b spikes d%4==2 ->
    # b's value 2 days earlier spikes exactly when a does
    assert got[("a", "b", 2)] == 1.0
    assert got[("a", "b", 0)] < 1.0
    # lag-0 is symmetric across the pair orientations
    assert got[("a", "b", 0)] == got[("b", "a", 0)]
    # rows: 2 ordered pairs x lags 0..3
    assert len(out) == 8
    # n_pairs shrinks with lag
    np_ = {
        (r.type_a, int(r.lag)): int(r.n_pairs) for r in out.itertuples()
    }
    assert np_[("a", 0)] == 10 and np_[("a", 3)] == 7
