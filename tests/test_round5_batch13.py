"""Planted pins for the round-5 batch-13 statistical audits:
auc_by_group (midrank ROC area), mann_kendall_daily (trend S/Z with tie
correction), acf_daily (lagged corr over the gap-filled grid) and
zipf_slope (ln-ln OLS over top tokens). Registry equality at sf0.01 and
sf0.1 is swept by tools/check_correctness.py (recorded in BASELINE.md)."""

import math

import numpy as np
import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.events import acf_daily, mann_kendall_daily
from ocr_platform_ray.functions.relational import auc_by_group
from ocr_platform_ray.functions.textstats import zipf_slope

DAY_US = 86_400_000_000


def _auc(rows):
    t = pa.table(
        {
            "g": pa.array([r[0] for r in rows], pa.string()),
            "s": pa.array([r[1] for r in rows], pa.int64()),
            "y": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    out = auc_by_group(rd.from_arrow(t), "g", "s", "y").to_pandas()
    return {
        r.g: (int(r.n_pos), int(r.n_neg), r.auc) for r in out.itertuples()
    }


def test_auc_planted():
    rows = (
        # perfect separation: all positives above all negatives -> 1.0
        [("a", 10, 1), ("a", 11, 1), ("a", 1, 0), ("a", 2, 0)]
        # perfect inversion -> 0.0
        + [("b", 1, 1), ("b", 2, 1), ("b", 10, 0), ("b", 11, 0)]
        # all scores tied -> midranks give exactly 0.5
        + [("c", 5, 1), ("c", 5, 1), ("c", 5, 0), ("c", 5, 0)]
        # one class empty -> undefined (None)
        + [("d", 1, 1), ("d", 2, 1)]
        # hand-computed with a tie across classes: scores 1-,2+,2-,3+
        # midranks 1, 2.5, 2.5, 4; R_pos = 6.5; AUC = (6.5-3)/4 = 0.875
        + [("e", 1, 0), ("e", 2, 1), ("e", 2, 0), ("e", 3, 1)]
    )
    got = _auc(rows)
    assert got["a"] == (2, 2, 1.0)
    assert got["b"] == (2, 2, 0.0)
    assert got["c"] == (2, 2, 0.5)
    assert got["d"][0] == 2 and got["d"][1] == 0 and math.isnan(got["d"][2])
    assert got["e"] == (2, 2, 0.875)


def test_auc_invariant_under_monotone_score_transform():
    """AUC is a rank statistic: squaring a positive integer score (a
    strictly monotone map) must not change it."""
    rng = np.random.default_rng(7)
    s = rng.integers(1, 50, size=300)
    y = rng.integers(0, 2, size=300)
    base = pa.table(
        {
            "g": pa.array(["g"] * 300, pa.string()),
            "s": pa.array(s, pa.int64()),
            "y": pa.array(y, pa.int64()),
        }
    )
    sq = base.set_column(1, "s", pa.array(s * s, pa.int64()))
    a1 = auc_by_group(rd.from_arrow(base), "g", "s", "y").to_pandas()
    a2 = auc_by_group(rd.from_arrow(sq), "g", "s", "y").to_pandas()
    assert a1["auc"].tolist() == a2["auc"].tolist()


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


def test_mann_kendall_planted():
    # "up": 1,2,3,4 events on days 0..3 -> every pair ascending,
    # S = 6, no ties, var = 4*3*13/18 = 26/3, z = 5/sqrt(26/3)
    rows = []
    for d in range(4):
        rows += [("up", d)] * (d + 1)
    # "flat": constant 2/day -> S = 0, all tied -> var = 0 -> z NULL
    for d in range(4):
        rows += [("flat", d)] * 2
    # "down": 3,2,1 -> S = -3, var = 3*2*11/18, z = (-3+1)/sqrt(...)
    for d in range(3):
        rows += [("down", d)] * (3 - d)
    out = mann_kendall_daily(_events(rows)).to_pandas()
    got = {
        r.event_type: (int(r.n_days), int(r.s_stat), r.z)
        for r in out.itertuples()
    }
    assert got["up"][:2] == (4, 6)
    assert got["up"][2] == round(5.0 / math.sqrt(26.0 / 3.0), 6)
    assert got["flat"][:2] == (4, 0) and math.isnan(got["flat"][2])
    assert got["down"][:2] == (3, -3)
    assert got["down"][2] == round(-2.0 / math.sqrt(33.0 / 18.0 * 2.0), 6)


def test_acf_planted_alternating():
    """A strict 2-day alternation (3,1,3,1,...) has lag-1 acf = -1 and
    lag-2 acf = +1; a gap day is filled with a true zero on both
    engines (pin: drop day 3 of a 0..5 grid -> the filled series is
    3,1,3,0,3,1 and lag-1 corr is hand-checkable, not NULL)."""
    rows = []
    for d in range(6):
        rows += [("alt", d)] * (3 if d % 2 == 0 else 1)
    out = acf_daily(_events(rows), max_lag=2).to_pandas()
    got = {(r.event_type, int(r.lag)): r.acf for r in out.itertuples()}
    assert got[("alt", 1)] == -1.0
    assert got[("alt", 2)] == 1.0

    rows_gap = [r for r in rows if r[1] != 3]
    out2 = acf_daily(_events(rows_gap), max_lag=1).to_pandas()
    # filled series 3,1,3,0,3,1: pairs x=(1,3,0,3,1) vs lag=(3,1,3,0,3)
    a = np.array([1, 3, 0, 3, 1], dtype=np.float64)
    b = np.array([3, 1, 3, 0, 3], dtype=np.float64)
    want = round(
        float(np.corrcoef(a, b)[0, 1]), 6
    )
    got2 = out2[out2["lag"] == 1]["acf"].iloc[0]
    assert abs(got2 - want) < 1e-9


def test_zipf_planted_exact_power_law():
    """Counts 64,32,16,8,4,2 over 6 tokens are an exact 2^-rank law in
    ln-ln space: slope = -ln(2)/mean-slope? No — x = ln(rank) is NOT
    linear in rank, so pin instead with the closed-form OLS the engine
    mirrors, computed here independently with numpy.polyfit."""
    docs = []
    for i, c in enumerate([64, 32, 16, 8, 4, 2]):
        docs += [f"tok{i}"] * c
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(
                    [str(i) for i in range(len(docs))], pa.string()
                ),
                "text": pa.array(docs, pa.string()),
            }
        )
    )
    out = zipf_slope(ds, top_n=10).to_pandas()
    assert out["n_tokens"].tolist() == [6]
    x = np.log(np.arange(1, 7, dtype=np.float64))
    y = np.log(np.array([64, 32, 16, 8, 4, 2], dtype=np.float64))
    slope, intercept = np.polyfit(x, y, 1)
    assert abs(out["slope"].iloc[0] - round(float(slope), 6)) < 1e-6
    assert abs(out["intercept"].iloc[0] - round(float(intercept), 6)) < 1e-6
    # a perfect-fit check: r2 == 1 would need collinear points; these
    # aren't, so just bound it
    assert 0.9 < out["r2"].iloc[0] <= 1.0


def test_zipf_degenerate_single_token():
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(["0"], pa.string()),
                "text": pa.array(["aaa aaa aaa"], pa.string()),
            }
        )
    )
    out = zipf_slope(ds, top_n=10).to_pandas()
    assert out["n_tokens"].tolist() == [1]
    assert math.isnan(out["slope"].iloc[0])
