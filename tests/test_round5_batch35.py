"""Planted pins for round-5 batch 35: Gumbel daily-max fit, Poisson
dispersion, Wald-Wolfowitz runs test. Registry equality vs DuckDB at
sf0.01/sf0.1 is swept by tools/check_correctness.py."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.events import (
    dispersion_daily,
    gumbel_daily,
    runs_test_daily,
)

DAY_US = 86_400_000_000


def _events(counts_by_day, etype="A"):
    """counts_by_day: list of per-day event counts."""
    base = 1_700_000_000_000_000
    base -= base % DAY_US
    rows = []
    for d, n in enumerate(counts_by_day):
        rows += [base + d * DAY_US + 1000 * k for k in range(n)]
    return rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array([etype] * len(rows), pa.string()),
                "ts": pa.array(rows, pa.timestamp("us")),
            }
        )
    )


def test_gumbel_moments_recovered():
    counts = [5, 8, 6, 9, 7, 30, 5, 6]  # one spike
    out = gumbel_daily(_events(counts)).to_pandas().iloc[0]
    x = np.array(counts, float)
    mean = x.mean()
    sd = x.std(ddof=1)
    beta = sd * math.sqrt(6.0) / math.pi
    mu = mean - 0.5772156649015329 * beta
    ret = mu - beta * math.log(-math.log(1.0 - 1.0 / 30.0))
    assert out["n_days"] == 8
    assert out["beta"] == round(beta, 6)
    assert out["mu"] == round(mu, 6)
    assert out["ret_level"] == round(ret, 6)
    # the return level should sit ABOVE the mean (upper tail)
    assert out["ret_level"] > mean


def test_dispersion_poisson_like_vs_bursty():
    steady = dispersion_daily(_events([5, 6, 5, 4, 5, 6, 5, 4]))
    bursty = dispersion_daily(_events([0, 0, 20, 0, 0, 20, 0, 0]))
    s = steady.to_pandas().iloc[0]
    b = bursty.to_pandas().iloc[0]
    assert s["vmr"] < 1.0   # under-dispersed steady stream
    assert b["vmr"] > 10.0  # heavily over-dispersed bursts
    # the grid spans OBSERVED min..max day (2..5): [20, 0, 0, 20] —
    # leading/trailing silent days don't exist on either engine
    x = np.array([20, 0, 0, 20], float)
    want = x.var(ddof=1) / x.mean()
    assert b["n_days"] == 4
    assert b["vmr"] == round(want, 6)
    assert b["dispersion"] == round(3.0 * want, 6)


def test_runs_test_alternating_vs_blocked():
    # alternating above/below -> maximal runs -> strongly positive z
    alt = runs_test_daily(
        _events([1, 9, 1, 9, 1, 9, 1, 9, 1, 9])
    ).to_pandas().iloc[0]
    assert alt["n_above"] == 5 and alt["n_below"] == 5
    assert alt["n_runs"] == 10
    assert alt["z"] > 2.0
    # blocked (5 low then 5 high) -> 2 runs -> strongly negative z
    blk = runs_test_daily(
        _events([1, 1, 1, 1, 1, 9, 9, 9, 9, 9])
    ).to_pandas().iloc[0]
    assert blk["n_runs"] == 2
    assert blk["z"] < -2.0
    # hand-check z for the blocked case
    n1 = n2 = 5.0
    n = 10.0
    mu = 2 * n1 * n2 / n + 1
    var = 2 * n1 * n2 * (2 * n1 * n2 - n) / (n * n * (n - 1))
    assert blk["z"] == round((2 - mu) / math.sqrt(var), 6)


def test_runs_test_median_days_excluded():
    # median of [1,5,5,5,9] = 5 -> the three 5-days drop out
    out = runs_test_daily(_events([1, 5, 5, 5, 9])).to_pandas().iloc[0]
    assert out["n_above"] == 1 and out["n_below"] == 1
    assert out["n_runs"] == 2
    # var term is 0 at n1=n2=1 -> z NULL
    assert pd.isna(out["z"])
