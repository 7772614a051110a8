"""Planted pins for round-5 batch 45: conversion-lag quartiles and the
exact-dup storage-waste ledger. Registry equality vs DuckDB at
sf0.01/sf0.1 is swept by tools/check_correctness.py."""

import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.dedup import dup_bytes_by_source
from ocr_platform_ray.functions.events import conversion_lag_quantiles

DAY_US = 86_400_000_000


def _events(specs):
    """specs: (user_id, event_type, day)."""
    return rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([s[0] for s in specs], pa.int64()),
                "event_type": pa.array([s[1] for s in specs], pa.string()),
                "ts": pa.array(
                    [s[2] * DAY_US for s in specs], pa.timestamp("us")
                ),
            }
        )
    )


def test_conversion_lag_planted():
    ev = _events(
        [
            (1, "signup", 0), (1, "purchase", 2),   # lag 2
            (2, "signup", 0), (2, "purchase", 10),  # lag 10
            (3, "signup", 5), (3, "purchase", 5),   # lag 0 (same day)
            (4, "signup", 9),                        # never converts
            (5, "purchase", 3),                      # purchase, no signup
            (6, "purchase", 1), (6, "signup", 4),    # converted BEFORE signup
        ]
    )
    out = conversion_lag_quantiles(ev).to_pandas()
    # lags [0, 2, 10]: p25 = 1.0, p50 = 2.0, p75 = 6.0
    assert out["n_converted"].tolist() == [3]
    assert out["p25_days"].tolist() == [1.0]
    assert out["p50_days"].tolist() == [2.0]
    assert out["p75_days"].tolist() == [6.0]


def test_conversion_lag_uses_first_of_each():
    # second signup later must not shrink the lag; second purchase
    # later must not grow it
    ev = _events(
        [
            (1, "signup", 0), (1, "signup", 6),
            (1, "purchase", 8), (1, "purchase", 20),
        ]
    )
    out = conversion_lag_quantiles(ev).to_pandas()
    assert out["n_converted"].tolist() == [1]
    assert out["p50_days"].tolist() == [8.0]


def test_dup_bytes_planted():
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "source": pa.array(
                    ["s1", "s2", "s1", "s2", "s1"], pa.string()
                ),
                # "dup" appears 3x: keeper doc 1 (s1); copies doc 2 (s2),
                # doc 4 (s2); "solo"/"único" unique
                "text": pa.array(
                    ["dup", "dup", "solo", "dup", "único"], pa.string()
                ),
            }
        )
    )
    out = dup_bytes_by_source(docs).to_pandas().set_index("source")
    assert out.loc["s2", "n_dup_docs"] == 2
    assert out.loc["s2", "bytes_reclaimable"] == 6  # 2 x 3 utf8 bytes
    assert "s1" not in out.index  # keeper's source owes nothing


def test_dup_bytes_keeper_in_dup_heavy_source():
    # keeper lives in the SAME source as other copies: source debited
    # only for the extra copies
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([10, 11, 12], pa.int64()),
                "source": pa.array(["s", "s", "s"], pa.string()),
                "text": pa.array(["ab", "ab", "ab"], pa.string()),
            }
        )
    )
    out = dup_bytes_by_source(docs).to_pandas()
    assert out["n_dup_docs"].tolist() == [2]
    assert out["bytes_reclaimable"].tolist() == [4]
