"""Planted pins for round-5 batch 18: the Jaro–Winkler pair kernel
(pinned bit-for-bit against DuckDB's jaro_winkler_similarity, the
oracle's implementation) and the Theil–Sen robust daily trend.
Registry equality at sf0.01/sf0.1 is swept by tools/check_correctness.py."""

import duckdb
import numpy as np
import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.events import theil_sen_daily
from ocr_platform_ray.functions.linkage import (
    jaro_winkler_bytes_block,
    jw_blocked_pairs,
)

DAY_US = 86_400_000_000


def test_jw_kernel_pinned_cases():
    """The published Winkler examples + the semantics the kernel pins:
    byte-based, floor-halved transpositions, 0.7 boost threshold."""
    cases = [
        (b"MARTHA", b"MARHTA", 0.9611111111111111),
        (b"DIXON", b"DICKSONX", 0.8133333333333332),
        (b"JELLYFISH", b"SMELLYFISH", 0.8962962962962964),
        (b"", b"abc", 0.0),
        (b"", b"", 0.0),
        (b"ab", b"ba", 0.0),  # window 0: no matches
        ("café".encode(), b"cafe", 0.8483333333333334),  # bytes, not chars
        (b"ab", b"abcdefgh", 0.8),
        # 3 mismatched positions -> t = 1 (floor), NOT 1.5
        (b"ABCDVWXYZ", b"BCADVWXYZ", 0.9629629629629629),
        # jaro <= 0.7: boost NOT applied despite common prefix
        (b"ab", b"axyzw", 0.5666666666666667),
    ]
    got = jaro_winkler_bytes_block(
        [a for a, _, _ in cases], [b for _, b, _ in cases]
    )
    want = np.array([w for _, _, w in cases])
    assert np.array_equal(got, want)


def test_jw_kernel_equals_duckdb_randomized():
    """500 random byte-string pairs (mixed lengths, shared prefixes,
    repeats): kernel == DuckDB jaro_winkler_similarity EXACTLY."""
    rng = np.random.default_rng(4242)
    alpha = "abcdefgh"
    A, B = [], []
    for _ in range(500):
        la, lb = int(rng.integers(0, 12)), int(rng.integers(0, 12))
        a = "".join(rng.choice(list(alpha), la))
        b = "".join(rng.choice(list(alpha), lb))
        if rng.random() < 0.3:  # force shared prefixes (boost region)
            b = a[: int(rng.integers(0, max(la, 1)))] + b
        A.append(a)
        B.append(b)
    got = jaro_winkler_bytes_block(
        [a.encode() for a in A], [b.encode() for b in B]
    )
    con = duckdb.connect()
    want = np.array(
        [
            con.execute(
                "SELECT jaro_winkler_similarity(?, ?)", [a, b]
            ).fetchone()[0]
            for a, b in zip(A, B)
        ]
    )
    assert np.array_equal(got, want)


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


def test_jw_blocked_pairs_planted():
    """Three near-identical titles in one block score >= 0.9 pairwise;
    an unrelated doc in another block never pairs with them."""
    texts = [
        "Annual Report 2024: Revenue Summary",
        "Annual Report 2024: Revenue Summery",
        "Annual Report 2024 - revenue summary!",
        "zebra zebra completely different",
    ]
    out = jw_blocked_pairs(_docs(texts), threshold=0.9).to_pandas()
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert pairs == {("d000", "d001"), ("d000", "d002"), ("d001", "d002")}
    assert (out["jw"] >= 0.9).all()


def test_jw_blocked_pairs_threshold_excludes():
    """Same block (shared prefix) but diverging tails fall below 0.9."""
    texts = ["prefix aaaa bbbb cccc dddd", "prefix zzzz yyyy xxxx wwww"]
    out = jw_blocked_pairs(_docs(texts), threshold=0.9).to_pandas()
    assert len(out) == 0


def _events(day_counts):
    rows = [(t, d) for t, days in day_counts.items()
            for d, n in enumerate(days) for _ in range(n)]
    return rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "ts": pa.array(
                    [r[1] * DAY_US + 3 for r in rows], pa.timestamp("us")
                ),
            }
        )
    )


def test_theil_sen_exact_line():
    """On y = 2t + 3 every pairwise slope is exactly 2 and every
    intercept residual exactly 3."""
    out = theil_sen_daily(
        _events({"lin": [3 + 2 * t for t in range(10)]})
    ).to_pandas()
    assert out["slope"].tolist() == [2.0]
    assert out["intercept"].tolist() == [3.0]
    assert out["n_days"].tolist() == [10]


def test_theil_sen_robust_to_outlier_day():
    """One 100x spike day barely moves the median slope (OLS would be
    dragged hard)."""
    ys = [10 + t for t in range(15)]
    ys[7] = 1000
    out = theil_sen_daily(_events({"sp": ys})).to_pandas()
    assert abs(out["slope"].iloc[0] - 1.0) < 0.2


def test_theil_sen_hand_median():
    """3 days [1, 10, 14] (day counts; a zero first day would shift
    the grid origin): slopes {9, 6.5, 4}, median 6.5; intercepts of
    y - 6.5t = [1, 3.5, 1], median 1."""
    out = theil_sen_daily(_events({"h": [1, 10, 14]})).to_pandas()
    assert out["slope"].tolist() == [6.5]
    assert out["intercept"].tolist() == [1.0]
