"""Planted pins for round-5 batch 25: weekly cohort matrix, partition
balance audit, crosstab adjusted residuals, odds ratios. Registry
equality vs DuckDB at sf0.01/sf0.1 is swept by
tools/check_correctness.py."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.dedup import partition_balance
from ocr_platform_ray.functions.events import cohort_matrix
from ocr_platform_ray.functions.relational import (
    crosstab_residuals,
    odds_ratio_by_group,
)

WEEK_US = 604_800_000_000


def _events(rows):
    """rows: (user_id, week_offset_float)."""
    base = 1_700_000_000_000_000
    base -= base % WEEK_US  # align to a week boundary for readable offsets
    return rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [base + int(r[1] * WEEK_US) for r in rows],
                    pa.timestamp("us"),
                ),
            }
        )
    )


def test_cohort_matrix_planted():
    rows = [
        # cohort week 0: users 1,2,3; week 1: 1,2 return; week 2: 1
        (1, 0.1), (2, 0.2), (3, 0.3),
        (1, 1.1), (2, 1.2),
        (1, 2.5),
        # cohort week 1: user 4; never returns
        (4, 1.9),
        # duplicate events same week must not double-count
        (1, 0.8), (1, 0.9),
    ]
    out = cohort_matrix(_events(rows)).to_pandas()
    key = out.set_index(["cohort_week", "offset_weeks"])
    c0 = out[out["offset_weeks"] == 0].set_index("cohort_week")["n_users"]
    w0 = c0.index.min()
    assert c0[w0] == 3 and c0[w0 + 1] == 1
    assert key.loc[(w0, 1), "n_users"] == 2
    assert key.loc[(w0, 1), "retention"] == round(2 / 3, 6)
    assert key.loc[(w0, 2), "n_users"] == 1
    assert (w0 + 1, 1) not in key.index
    assert key.loc[(w0, 0), "retention"] == 1.0


def test_partition_balance_uniform_and_exact():
    ids = pa.table({"doc_id": pa.array([f"d{i}" for i in range(4096)])})
    out = partition_balance(
        rd.from_arrow(ids), "doc_id", n_parts=16
    ).to_pandas()
    r = out.iloc[0]
    assert r["n_rows"] == 4096 and r["n_parts"] == 16
    assert r["n_used"] == 16
    assert r["min_n"] + r["max_n"] >= 2 * 4096 / 16 * 0.5  # sane bounds
    assert r["mean_n"] == 256.0
    # exact recompute from the same hash contract
    from ocr_platform_ray.md5np import md5_u32

    b = (md5_u32(ids.column("doc_id")) % np.uint32(16)).astype(np.int64)
    c = np.bincount(b, minlength=16)
    assert r["min_n"] == c.min() and r["max_n"] == c.max()
    mean = 4096 / 16.0
    var = float((c * c).sum()) / 16.0 - mean * mean
    assert r["cv"] == round(math.sqrt(max(var, 0.0)) / mean, 6)
    assert r["imbalance"] == round(c.max() / mean, 6)


def test_partition_balance_single_key_skew():
    ids = pa.table({"doc_id": pa.array(["same"] * 100)})
    out = partition_balance(
        rd.from_arrow(ids), "doc_id", n_parts=8
    ).to_pandas()
    r = out.iloc[0]
    assert r["n_used"] == 1 and r["max_n"] == 100 and r["min_n"] == 0
    assert r["imbalance"] == 8.0  # one bucket holds everything


def test_crosstab_residuals_planted():
    t = pa.table(
        {
            "source": pa.array(["a"] * 30 + ["b"] * 30),
            "lang": pa.array(
                ["en"] * 25 + ["fr"] * 5 + ["en"] * 5 + ["fr"] * 25
            ),
        }
    )
    out = crosstab_residuals(
        rd.from_arrow(t), "source", "lang"
    ).to_pandas()
    cell = out.set_index(["source", "lang"])
    # E(a,en) = 30*30/60 = 15; denom = 15 * .5 * .5 = 3.75
    assert cell.loc[("a", "en"), "expected"] == 15.0
    want = (25 - 15) / math.sqrt(15 * 0.5 * 0.5)
    assert cell.loc[("a", "en"), "adj_residual"] == round(want, 6)
    # residuals of a 2x2 are equal in magnitude, alternating sign
    vals = cell["adj_residual"].to_numpy()
    assert np.allclose(np.abs(vals), abs(want))
    assert cell.loc[("a", "fr"), "adj_residual"] == round(-want, 6)


def test_crosstab_residuals_degenerate_single_column():
    t = pa.table(
        {
            "source": pa.array(["a", "a", "b"]),
            "lang": pa.array(["en", "en", "en"]),
        }
    )
    out = crosstab_residuals(rd.from_arrow(t), "source", "lang").to_pandas()
    assert out["adj_residual"].isna().all()  # cb == N -> variance 0


def test_odds_ratio_planted():
    # lang en: 30 flagged, 10 not; rest: 10 flagged, 30 not
    t = pa.table(
        {
            "lang": pa.array(["en"] * 40 + ["fr"] * 40),
            "has_digit": pa.array([True] * 30 + [False] * 10
                                  + [True] * 10 + [False] * 30),
        }
    )
    out = odds_ratio_by_group(
        rd.from_arrow(t), "lang", "has_digit"
    ).to_pandas().set_index("lang")
    orr = (30 * 30) / (10 * 10)
    assert out.loc["en", "odds_ratio"] == 9.0
    se = math.sqrt(1 / 30 + 1 / 10 + 1 / 10 + 1 / 30)
    assert out.loc["en", "ci_lo"] == round(
        math.exp(math.log(orr) - 1.96 * se), 6
    )
    assert out.loc["en", "ci_hi"] == round(
        math.exp(math.log(orr) + 1.96 * se), 6
    )
    # fr is the mirror: OR = 1/9
    assert out.loc["fr", "odds_ratio"] == round(1 / 9, 6)


def test_odds_ratio_zero_cell_is_null():
    t = pa.table(
        {
            "lang": pa.array(["en"] * 4 + ["fr"] * 4),
            "has_digit": pa.array([True] * 4 + [True, False, False, False]),
        }
    )
    out = odds_ratio_by_group(
        rd.from_arrow(t), "lang", "has_digit"
    ).to_pandas().set_index("lang")
    assert pd.isna(out.loc["en", "odds_ratio"])  # b == 0
    assert pd.isna(out.loc["fr", "odds_ratio"])  # its d == 0
