"""Planted pins for round-5 batch 16: sorted-neighborhood blocking
(Hernández & Stolfo 1995) and the inter-event burstiness coefficient
(Goh & Barabási 2008). Registry equality vs DuckDB at sf0.01/sf0.1 is
swept by tools/check_correctness.py."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.events import burstiness_by_type
from ocr_platform_ray.functions.linkage import sorted_neighborhood_pairs


def _docs(texts):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(
                    [f"d{i:03d}" for i in range(len(texts))], pa.string()
                ),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def _brute_snm(texts, window, key_chars=32):
    import re

    keys = [
        re.sub(r"[^a-z0-9]", "", t.lower())[:key_chars] for t in texts
    ]
    order = sorted(range(len(texts)), key=lambda i: (keys[i], f"d{i:03d}"))
    pairs = set()
    for a in range(len(order)):
        for b in range(a + 1, min(a + window + 1, len(order))):
            pairs.add((f"d{order[a]:03d}", f"d{order[b]:03d}", b - a))
    return pairs


def test_snm_matches_bruteforce():
    """20 docs with clustered prefixes: engine pairs == brute-force
    window pairs over the (normalized key, id) sort order."""
    texts = [f"The Topic {chr(97 + i % 5)} doc number {i}!" for i in range(20)]
    out = sorted_neighborhood_pairs(_docs(texts), window=3).to_pandas()
    got = set(zip(out["doc_a"], out["doc_b"], out["rank_gap"]))
    assert got == _brute_snm(texts, 3)


def test_snm_each_pair_emitted_once():
    """The dual-bucket visit scheme must emit every qualifying pair in
    exactly ONE bucket — no duplicates even across window boundaries."""
    texts = [f"prefix {i:04d} body" for i in range(37)]
    out = sorted_neighborhood_pairs(_docs(texts), window=5).to_pandas()
    assert not out.duplicated(["doc_a", "doc_b"]).any()
    # sequential keys: rank order == index order, so pair count is exact
    n = 37
    assert len(out) == sum(min(5, n - 1 - i) for i in range(n))


def test_snm_prefix_chars_invariance():
    """The range-bucketed distributed rank is an implementation detail:
    changing prefix_chars must not change the result set."""
    texts = [f"{chr(97 + i % 7)} entry {i}" for i in range(25)]
    a = sorted_neighborhood_pairs(_docs(texts), window=4,
                                  prefix_chars=1).to_pandas()
    b = sorted_neighborhood_pairs(_docs(texts), window=4,
                                  prefix_chars=3).to_pandas()
    key = lambda df: sorted(zip(df["doc_a"], df["doc_b"], df["rank_gap"]))
    assert key(a) == key(b)


def _events(rows):
    """rows: (event_type, ts_us, event_id)."""
    return rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "event_id": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    )


def test_burstiness_periodic_is_minus_one():
    """Perfectly periodic gaps: sigma = 0, mu > 0 -> B = -1."""
    rows = [("tick", 1000 * i, i) for i in range(10)]
    out = burstiness_by_type(_events(rows)).to_pandas()
    assert out["burstiness"].tolist() == [-1.0]
    assert out["n_gaps"].tolist() == [9]
    assert out["mean_gap_us"].tolist() == [1000.0]


def test_burstiness_hand_value():
    """Gaps [1, 1, 10] (us): mu = 4, var = 102/3 - 16 = 18 exactly,
    B = (sqrt(18) - 4) / (sqrt(18) + 4)."""
    ts = [0, 1, 2, 12]
    rows = [("b", t, i) for i, t in enumerate(ts)]
    out = burstiness_by_type(_events(rows)).to_pandas()
    s = np.sqrt(18.0)
    assert out["burstiness"].tolist() == [round((s - 4.0) / (s + 4.0), 6)]


def test_burstiness_single_event_type_dropped():
    """A type with < 2 events has no gaps: no output row."""
    rows = [("lonely", 5, 0), ("pair", 0, 1), ("pair", 7, 2)]
    out = burstiness_by_type(_events(rows)).to_pandas()
    assert sorted(out["event_type"]) == ["pair"]


def test_burstiness_tie_break_on_event_id():
    """Equal timestamps order by event_id, so the gap sequence (and
    hence the moments) is deterministic: two ties -> gaps [0, 0, 9]."""
    rows = [("t", 0, 2), ("t", 0, 1), ("t", 0, 3), ("t", 9, 4)]
    out = burstiness_by_type(_events(rows)).to_pandas()
    # mu = 3, var = 81/3 - 9 = 18
    s = np.sqrt(18.0)
    assert out["burstiness"].tolist() == [round((s - 3.0) / (s + 3.0), 6)]
    assert out["mean_gap_us"].tolist() == [3.0]
