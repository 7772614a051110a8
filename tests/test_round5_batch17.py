"""Planted pins for round-5 batch 17: Holt level+trend smoothing,
Kendall tau-b per group, Kruskal–Wallis H, and co-occurrence triangle
counts. Registry equality vs DuckDB at sf0.01/sf0.1 is swept by
tools/check_correctness.py."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.events import holt_daily
from ocr_platform_ray.functions.graphs import cosupply_triangles
from ocr_platform_ray.functions.relational import (
    kendall_tau_by_group,
    kruskal_wallis,
)

DAY_US = 86_400_000_000


def _events(day_counts):
    rows = [(t, d) for t, days in day_counts.items()
            for d, n in enumerate(days) for _ in range(n)]
    return rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "ts": pa.array(
                    [r[1] * DAY_US + 7 for r in rows], pa.timestamp("us")
                ),
            }
        )
    )


def test_holt_hand_recurrence():
    xs = [4, 7, 2, 9, 5]
    out = holt_daily(_events({"a": xs})).to_pandas().sort_values("day")
    l, b = float(xs[0]), float(xs[1] - xs[0])
    want_l, want_b = [l], [b]
    for x in xs[1:]:
        l_new = 0.3 * float(x) + 0.7 * (l + b)
        b = 0.1 * (l_new - l) + 0.9 * b
        l = l_new
        want_l.append(round(l, 6))
        want_b.append(round(b, 6))
    assert out["level"].tolist() == [round(v, 6) for v in want_l]
    assert out["trend"].tolist() == [round(v, 6) for v in want_b]


def test_holt_tracks_linear_ramp():
    """On x_t = 10 + 3t the exact recursion converges to trend 3."""
    xs = [10 + 3 * t for t in range(40)]
    out = holt_daily(_events({"r": xs})).to_pandas().sort_values("day")
    assert abs(out["trend"].iloc[-1] - 3.0) < 0.05
    assert abs(out["level"].iloc[-1] - xs[-1]) < 1.0


def test_holt_single_day_trend_zero():
    out = holt_daily(_events({"one": [5]})).to_pandas()
    assert out["level"].tolist() == [5.0]
    assert out["trend"].tolist() == [0.0]


def _xy(rows):
    return rd.from_arrow(
        pa.table(
            {
                "g": pa.array([r[0] for r in rows], pa.string()),
                "x": pa.array([r[1] for r in rows], pa.int64()),
                "y": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    )


def _brute_tau_b(pairs):
    n = len(pairs)
    C = D = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = pairs[j][0] - pairs[i][0]
            dy = pairs[j][1] - pairs[i][1]
            if dx == 0 and dy == 0:
                tx += 1
                ty += 1
            elif dx == 0:
                tx += 1
            elif dy == 0:
                ty += 1
            elif (dx > 0) == (dy > 0):
                C += 1
            else:
                D += 1
    n0 = n * (n - 1) // 2
    return (C - D) / (np.sqrt(float(n0 - tx)) * np.sqrt(float(n0 - ty)))


def test_kendall_matches_bruteforce_with_ties():
    vals = [(1, 2), (2, 2), (2, 5), (3, 1), (3, 1), (4, 7), (5, 6),
            (5, 6), (6, 3), (7, 9)]
    out = kendall_tau_by_group(
        _xy([("g1", x, y) for x, y in vals]), "g", "x", "y"
    ).to_pandas()
    assert out["n"].tolist() == [len(vals)]
    assert out["tau"].tolist() == [round(_brute_tau_b(vals), 6)]


def test_kendall_perfect_and_reversed():
    rows = [("up", i, 10 * i) for i in range(8)]
    rows += [("down", i, -3 * i) for i in range(8)]
    out = kendall_tau_by_group(_xy(rows), "g", "x", "y").to_pandas()
    d = dict(zip(out["g"], out["tau"]))
    assert d["up"] == 1.0 and d["down"] == -1.0


def test_kendall_constant_marginal_is_null():
    rows = [("c", 1, y) for y in range(5)]
    out = kendall_tau_by_group(_xy(rows), "g", "x", "y").to_pandas()
    assert np.isnan(out["tau"].iloc[0])


def _gv(rows):
    return rd.from_arrow(
        pa.table(
            {
                "g": pa.array([r[0] for r in rows], pa.string()),
                "v": pa.array([r[1] for r in rows], pa.int64()),
            }
        )
    )


def _brute_h(groups):
    """Textbook tie-corrected H via midranks (float, small data)."""
    allv = sorted(v for g in groups for v in g)
    n = len(allv)
    rank = {}
    i = 0
    while i < len(allv):
        j = i
        while j < len(allv) and allv[j] == allv[i]:
            j += 1
        rank[allv[i]] = (i + 1 + j) / 2.0
        i = j
    s = sum(
        (sum(rank[v] for v in g)) ** 2 / len(g) for g in groups
    )
    h = 12.0 / (n * (n + 1)) * s - 3 * (n + 1)
    from collections import Counter

    ties = sum(t**3 - t for t in Counter(allv).values())
    return h / (1.0 - ties / float(n**3 - n))


def test_kruskal_matches_textbook():
    groups = [[7, 7, 8, 12], [5, 6, 6, 9, 10], [1, 2, 2, 3]]
    rows = [(f"g{i}", v) for i, g in enumerate(groups) for v in g]
    out = kruskal_wallis(_gv(rows), "g", "v").to_pandas()
    assert out["n"].tolist() == [13] and out["k"].tolist() == [3]
    # engine output is 6dp-rounded; the brute value is unrounded
    assert out["h"].iloc[0] == round(_brute_h(groups), 6)


def test_kruskal_all_equal_is_null():
    rows = [("a", 5)] * 3 + [("b", 5)] * 4
    out = kruskal_wallis(_gv(rows), "g", "v").to_pandas()
    assert np.isnan(out["h"].iloc[0])


def _lineitem(order_supps):
    rows = [(o, s) for o, supps in order_supps for s in supps]
    return rd.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_suppkey": pa.array([r[1] for r in rows], pa.int64()),
            }
        )
    )


def test_triangles_k4():
    """One order supplied by 4 suppliers = K4: every node has degree 3,
    3 triangles, clustering 1.0."""
    out = cosupply_triangles(
        _lineitem([(1, [10, 11, 12, 13])])
    ).to_pandas()
    assert out["degree"].tolist() == [3] * 4
    assert out["n_triangles"].tolist() == [3] * 4
    assert out["clustering"].tolist() == [1.0] * 4


def test_triangles_path_has_none():
    """Orders chaining pairs 1-2, 2-3, 3-4: a path, zero triangles;
    endpoints have degree 1 -> clustering NULL."""
    out = cosupply_triangles(
        _lineitem([(1, [1, 2]), (2, [2, 3]), (3, [3, 4])])
    ).to_pandas().sort_values("l_suppkey")
    assert out["n_triangles"].tolist() == [0] * 4
    assert np.isnan(out["clustering"].iloc[0])
    assert out["clustering"].iloc[1] == 0.0


def test_triangles_dedup_across_orders():
    """The same supplier pair in many orders is ONE edge; duplicate
    lineitems of one supplier in one order are ignored."""
    out = cosupply_triangles(
        _lineitem(
            [(1, [1, 2, 3]), (2, [1, 2]), (3, [2, 3, 3]), (4, [1, 3])]
        )
    ).to_pandas()
    assert out["degree"].tolist() == [2] * 3
    assert out["n_triangles"].tolist() == [1] * 3
    assert out["clustering"].tolist() == [1.0] * 3
