"""Randomized equivalence pins for the session's new operators: each
test generates a seeded random input and checks the distributed
implementation against an independent single-process recomputation
(numpy/pandas brute force) — the conformance-suite idea applied to the
operator library. Seeds are FIXED so failures reproduce."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from ocr_platform_ray.functions.events import (
    gap_quantiles,
    interarrival_fit,
)
from ocr_platform_ray.functions.joins import bloom_semi_join
from ocr_platform_ray.functions.relational import anova_f_by_group

DAY_US = 86_400_000_000


@pytest.mark.parametrize("seed", [0, 7, 123])
def test_anova_matches_textbook_bruteforce(seed):
    rng = np.random.default_rng(seed)
    k = int(rng.integers(2, 6))
    groups, vals = [], []
    for g in range(k):
        n = int(rng.integers(2, 40))
        groups += [f"g{g}"] * n
        vals += rng.integers(0, 1000, n).tolist()
    ds = rd.from_arrow(
        pa.table(
            {"g": pa.array(groups, pa.string()),
             "x": pa.array(vals, pa.int64())}
        )
    )
    out = anova_f_by_group(ds, "g", "x").to_pandas()
    df = pd.DataFrame({"g": groups, "x": vals})
    grand = df["x"].mean()
    ssb = sum(
        len(s) * (s.mean() - grand) ** 2 for _, s in df.groupby("g")["x"]
    )
    ssw = sum(((s - s.mean()) ** 2).sum() for _, s in df.groupby("g")["x"])
    N = len(df)
    f = (ssb / (k - 1)) / (ssw / (N - k))
    assert out["n"].tolist() == [N] and out["k"].tolist() == [k]
    assert out["f_stat"].iloc[0] == pytest.approx(f, abs=6e-7)  # 6dp round
    assert out["eta2"].iloc[0] == pytest.approx(ssb / (ssb + ssw), abs=6e-7)


@pytest.mark.parametrize("seed", [1, 42])
def test_interarrival_and_gap_quantiles_match_bruteforce(seed):
    rng = np.random.default_rng(seed)
    types, ts = [], []
    base = 1_700_000_000_000_000
    base -= base % DAY_US
    for t in ["a", "b"]:
        n = int(rng.integers(3, 200))
        # spread over ~5 days incl. silent stretches
        stamps = np.sort(
            rng.integers(0, 5 * DAY_US, n).astype(np.int64)
        ) + base
        types += [t] * n
        ts += stamps.tolist()
    ev = rd.from_arrow(
        pa.table(
            {"event_type": pa.array(types, pa.string()),
             "ts": pa.array(ts, pa.timestamp("us"))}
        )
    )
    fit = interarrival_fit(ev).to_pandas().set_index("event_type")
    gq = gap_quantiles(ev).to_pandas().set_index("event_type")
    df = pd.DataFrame({"t": types, "ts": ts})
    for t, sub in df.groupby("t"):
        d = np.diff(np.sort(sub["ts"].to_numpy())) // 1_000_000
        assert fit.loc[t, "n_gaps"] == len(d)
        assert fit.loc[t, "mean_gap_s"] == pytest.approx(d.mean(), abs=6e-7)
        if len(d) >= 2 and d.sum() > 0:
            cv = d.std(ddof=1) / d.mean()
            assert fit.loc[t, "cv_gap"] == pytest.approx(cv, abs=6e-7)
        assert gq.loc[t, "p50"] == pytest.approx(
            np.quantile(d, 0.5, method="linear"), abs=6e-7
        )
        assert gq.loc[t, "p25"] == pytest.approx(
            np.quantile(d, 0.25, method="linear"), abs=6e-7
        )


@pytest.mark.parametrize("seed,m_bits", [(3, 1 << 16), (9, 256)])
def test_bloom_semi_join_matches_pandas(seed, m_bits):
    rng = np.random.default_rng(seed)
    lk = rng.integers(0, 500, 300).astype(np.int64)
    rk = rng.integers(0, 500, 40).astype(np.int64)
    left = rd.from_arrow(
        pa.table({"k": pa.array(lk), "i": pa.array(np.arange(300))})
    )
    right = rd.from_arrow(pa.table({"rk": pa.array(rk)}))
    got = (
        bloom_semi_join(
            left, right, on="k", right_on="rk", m_bits=m_bits,
            left_schema=pa.schema(
                [pa.field("k", pa.int64()), pa.field("i", pa.int64())]
            ),
            right_schema=pa.schema([pa.field("rk", pa.int64())]),
        )
        .to_pandas()
        .sort_values("i")
    )
    want = pd.DataFrame({"k": lk, "i": np.arange(300)})
    want = want[want["k"].isin(set(rk.tolist()))]
    assert got["i"].tolist() == want["i"].tolist()
