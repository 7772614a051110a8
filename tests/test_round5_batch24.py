"""Planted pins for round-5 batch 24: Bollinger daily bands,
Kaplan-Meier time-to-conversion, diversity indices, directed token
containment join, and customer revenue deciles. Registry equality vs
DuckDB at sf0.01/sf0.1 is swept by tools/check_correctness.py."""

import math
import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.events import bollinger_daily, kaplan_meier
from ocr_platform_ray.functions.linkage import token_containment_join
from ocr_platform_ray.functions.relational import (
    decile_revenue_shares,
    diversity_by_group,
)

DAY_US = 86_400_000_000


def _events(rows):
    """rows: (user_id, event_type, day_offset_float_days)."""
    base = 1_700_000_000_000_000  # any positive epoch-us anchor
    return rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
                "ts": pa.array(
                    [base + int(r[2] * DAY_US) for r in rows],
                    pa.timestamp("us"),
                ),
            }
        )
    )


def test_bollinger_planted():
    # one type, constant 5/day for 8 days then a spike of 50
    rows = []
    for d in range(8):
        rows += [(1, "view", d + 0.1)] * 5
    rows += [(1, "view", 8.1)] * 50
    out = bollinger_daily(_events(rows), window=7).to_pandas()
    out = out.sort_values("day").reset_index(drop=True)
    assert len(out) == 9
    # day 0: k=1 -> no sd/bands/breach
    assert pd.isna(out.loc[0, "sd_w"]) and pd.isna(out.loc[0, "breach"])
    # days 1..7: all-equal window -> sd 0, bands collapse to the mean,
    # n == mean -> no breach
    assert (out.loc[1:7, "sd_w"] == 0.0).all()
    assert (out.loc[1:7, "breach"] == 0).all()
    assert (out.loc[1:7, "mean_w"] == 5.0).all()
    # day 8 (spike): window = six 5s + one 50
    w = np.array([5] * 6 + [50], float)
    mean = w.sum() / 7.0
    sd = math.sqrt((np.sum(w * w) - w.sum() ** 2 / 7.0) / 6.0)
    assert out.loc[8, "mean_w"] == round(mean, 6)
    assert out.loc[8, "sd_w"] == round(sd, 6)
    assert out.loc[8, "breach"] == 1  # 50 > mean + 2 sd


def test_bollinger_gap_fills_zero():
    # events on day 0 and day 2 only: day 1 exists with n = 0
    rows = [(1, "view", 0.5)] * 3 + [(1, "view", 2.5)] * 3
    out = bollinger_daily(_events(rows)).to_pandas()
    assert len(out) == 3
    assert out.sort_values("day")["n"].tolist() == [3, 0, 3]


def test_kaplan_meier_textbook():
    """Classic hand-checkable KM: 5 users, conversions at t=1,1,3;
    one censored at t=2 (active, never purchases, last corpus day =
    day 4... construct explicitly)."""
    rows = [
        # u1: first day 0, purchase day 1 -> t=1 conv
        (1, "view", 0.1), (1, "purchase", 1.2),
        # u2: first day 0, purchase day 1 -> t=1 conv
        (2, "view", 0.2), (2, "purchase", 1.5),
        # u3: first day 0, purchase day 3 -> t=3 conv
        (3, "view", 0.3), (3, "purchase", 3.2),
        # u4: first day 2, never converts -> censored at gmax(4)-2 = 2
        (4, "view", 2.1), (4, "click", 2.9),
        # u5: first day 4 (sets gmax), never converts -> censored t=0
        (5, "view", 4.4),
    ]
    out = kaplan_meier(_events(rows), target_type="purchase").to_pandas()
    # risk sets: t=0 censoring (u5) happens AFTER events at t=0 (none);
    # t=1: at risk = {u1..u4} (u5 exited at t=0) = 4, d=2 -> S=0.5
    # t=3: at risk = {u3} (u4 censored at t=2) = 1, d=1 -> d=n -> S=0
    assert out["t_days"].tolist() == [1, 3]
    assert out["n_risk"].tolist() == [4, 1]
    assert out["n_conv"].tolist() == [2, 1]
    assert out["survival"].tolist() == [0.5, 0.0]


def test_diversity_planted():
    t = pa.table(
        {
            "source": pa.array(["a"] * 4 + ["b"] * 3 + ["c"]),
            "lang": pa.array(["en", "en", "fr", "de", "en", "en", "en", "xx"]),
        }
    )
    out = (
        diversity_by_group(rd.from_arrow(t), "source", "lang")
        .to_pandas()
        .set_index("source")
    )
    # a: counts 2,1,1 of 4
    p = np.array([2, 1, 1]) / 4.0
    assert out.loc["a", "shannon_bits"] == round(
        float(-(p * np.log2(p)).sum()), 6
    )
    assert out.loc["a", "simpson"] == round(1 - (2 * 1) / (4 * 3), 6)
    # b: monoculture -> shannon 0, simpson 0
    assert out.loc["b", "shannon_bits"] == 0.0
    assert out.loc["b", "simpson"] == 0.0
    # c: single row -> simpson undefined
    assert pd.isna(out.loc["c", "simpson"])


def _cdocs(rows):
    return rd.from_arrow(
        pa.table(
            {
                "source": pa.array([r[0] for r in rows], pa.string()),
                "doc_id": pa.array([r[1] for r in rows], pa.string()),
                "text": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )


def test_containment_planted_asymmetric():
    rows = [
        ("s", "small", "alpha beta gamma delta"),          # 4 tokens
        ("s", "big", "alpha beta gamma delta e f g h i j"),  # 10 tokens
    ]
    out = token_containment_join(_cdocs(rows), tau=0.8).to_pandas()
    # small -> big: 4/4 = 1.0 qualifies; big -> small: 4/10 does not
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["doc_a"], r["doc_b"]) == ("small", "big")
    assert r["n_inter"] == 4 and r["size_a"] == 4
    assert r["containment"] == 1.0


def test_containment_matches_bruteforce_fuzz():
    rng = np.random.default_rng(424242)
    base = [f"w{k}" for k in range(25)]
    rows = []
    for i in range(50):
        n = int(rng.integers(4, 16))
        rows.append(
            (f"s{i % 2}", f"d{i:02d}",
             " ".join(rng.choice(base, n, replace=False)))
        )
    toks = {
        (s, d): set(re.findall(r"[a-z0-9]+", t.lower()))
        for s, d, t in rows
    }
    for tau in (0.6, 0.8, 1.0):
        out = token_containment_join(_cdocs(rows), tau=tau).to_pandas()
        got = (
            set(zip(out["source"], out["doc_a"], out["doc_b"]))
            if len(out)
            else set()
        )
        want = set()
        for (sa, da), A in toks.items():
            for (sb, db), B in toks.items():
                if sa != sb or da == db:
                    continue
                if len(A) and float(len(A & B)) / float(len(A)) >= tau:
                    want.add((sa, da, db))
        assert got == want, f"tau={tau}"


def test_decile_shares_exact_tiny():
    # 20 customers, revenue = custkey dollars -> deciles of 2 by rank
    t = pa.table(
        {
            "o_custkey": pa.array(list(range(1, 21)), pa.int64()),
            "o_totalprice": pa.array(
                [float(i) for i in range(1, 21)], pa.float64()
            ),
        }
    )
    out = decile_revenue_shares(rd.from_arrow(t), k=10).to_pandas()
    assert out["tile"].tolist() == list(range(1, 11))
    assert out["n_customers"].tolist() == [2] * 10
    # tile j holds customers 2j-1, 2j -> cents sum
    cents = [(2 * j - 1 + 2 * j) * 100 for j in range(1, 11)]
    assert out["revenue_cents"].tolist() == cents
    total = sum(cents)
    assert out["share"].tolist() == [round(c / total, 6) for c in cents]
    assert out["cum_share"].iloc[-1] == 1.0


def test_decile_shares_tie_insensitive():
    # all ties: every tile's revenue is forced by counts alone
    t = pa.table(
        {
            "o_custkey": pa.array(list(range(25)), pa.int64()),
            "o_totalprice": pa.array([10.0] * 25, pa.float64()),
        }
    )
    out = decile_revenue_shares(rd.from_arrow(t), k=10).to_pandas()
    # 25 = 10 tiles: first 5 get 3 rows, rest 2
    assert out["n_customers"].tolist() == [3] * 5 + [2] * 5
    assert out["revenue_cents"].tolist() == [3000] * 5 + [2000] * 5
