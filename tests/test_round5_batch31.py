"""Planted pins for round-5 batch 31: l-diversity audit and temporal
PSI value drift. Registry equality vs DuckDB at sf0.01/sf0.1 is swept
by tools/check_correctness.py."""

import math

import numpy as np
import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.events import value_drift_psi
from ocr_platform_ray.functions.relational import l_diversity_audit

DAY_US = 86_400_000_000


def test_l_diversity_planted():
    t = pa.table(
        {
            "lang": pa.array(["en"] * 4 + ["fr"] * 2),
            "bucket": pa.array([0, 0, 0, 1, 0, 0], pa.int64()),
            "source": pa.array(["a", "a", "b", "a", "c", "c"]),
        }
    )
    out = l_diversity_audit(
        rd.from_arrow(t), ["lang", "bucket"], "source"
    ).to_pandas().set_index(["lang", "bucket"])
    # (en, 0): sources a,a,b -> l=2, n=3
    assert out.loc[("en", 0), "n_rows"] == 3
    assert out.loc[("en", 0), "l_distinct"] == 2
    # (en, 1): single row -> homogeneous class, l=1
    assert out.loc[("en", 1), "l_distinct"] == 1
    # (fr, 0): c,c -> k-anonymous-ish but HOMOGENEOUS: l=1
    assert out.loc[("fr", 0), "n_rows"] == 2
    assert out.loc[("fr", 0), "l_distinct"] == 1


def _events(rows):
    """rows: (event_type, day_float, value)."""
    base = 1_700_000_000_000_000
    base -= base % DAY_US
    return rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "ts": pa.array(
                    [base + int(r[1] * DAY_US) for r in rows],
                    pa.timestamp("us"),
                ),
                "value": pa.array([float(r[2]) for r in rows]),
            }
        )
    )


def test_drift_identical_halves_near_zero():
    # same distribution in both halves -> psi == 0 exactly (p == q)
    rows = []
    for d in (0, 1, 2, 3):  # days 0-1 first half, 2-3 second (mid=2)
        for v in (10.0, 20.0, 30.0):
            rows.append(("A", d + 0.5, v))
    out = value_drift_psi(_events(rows)).to_pandas()
    r = out.iloc[0]
    assert r["n_first"] == 6 and r["n_second"] == 6
    assert r["psi"] == 0.0


def test_drift_shifted_distribution_flags():
    # first half all at the low end, second half all at the high end
    rows = [("A", 0.5, 1.0)] * 20 + [("A", 3.5, 100.0)] * 20
    out = value_drift_psi(_events(rows)).to_pandas()
    r = out.iloc[0]
    assert r["psi"] > 1.0  # far past the 0.25 "investigate" bar
    # hand-check the smoothed formula: 20 in bin 0 half 1 / bin 9 half 2
    n1 = np.zeros(10); n1[0] = 20
    n2 = np.zeros(10); n2[9] = 20
    p = (n1 + 1) / 30.0
    q = (n2 + 1) / 30.0
    want = float(((p - q) * np.log(p / q)).sum())
    assert r["psi"] == round(want, 6)


def test_drift_constant_value_single_bin():
    rows = [("A", 0.5, 5.0)] * 4 + [("A", 3.5, 5.0)] * 6
    out = value_drift_psi(_events(rows)).to_pandas()
    r = out.iloc[0]
    # mx == mn -> everything in bin 0; smoothing keeps psi tiny but
    # the counts differ (4 vs 6) so psi is small nonzero
    n1 = np.zeros(10); n1[0] = 4
    n2 = np.zeros(10); n2[0] = 6
    p = (n1 + 1) / 14.0
    q = (n2 + 1) / 16.0
    want = float(((p - q) * np.log(p / q)).sum())
    assert r["psi"] == round(want, 6)
