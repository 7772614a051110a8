"""Planted pins for round-5 batch 28: Heaps-law fit, SRM check, Hill
tail estimator, Wilson CIs. Registry equality vs DuckDB at
sf0.01/sf0.1 is swept by tools/check_correctness.py."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.dedup import srm_check
from ocr_platform_ray.functions.relational import wilson_ci_by_group
from ocr_platform_ray.functions.textstats import (
    heaps_law,
    hill_tail_by_group,
)


def test_heaps_growing_vocab():
    # every doc introduces fresh tokens -> vocabulary keeps growing,
    # beta > 0 and the fit is tight
    docs = [
        " ".join(f"t{i}x{j}" for j in range(20)) for i in range(50)
    ]
    t = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(50)]),
            "text": pa.array(docs),
        }
    )
    out = heaps_law(rd.from_arrow(t)).to_pandas().iloc[0]
    assert out["n_points"] == 10
    # per-doc-unique tokens: V(N) is exactly linear in N -> beta = 1
    assert abs(out["beta"] - 1.0) < 1e-6
    assert out["r2"] == 1.0


def test_heaps_constant_vocab():
    # all docs share one tiny vocabulary -> flat curve, beta = 0,
    # DuckDB regr_r2 convention: zero y-variance reports 1.0
    t = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(40)]),
            "text": pa.array(["alpha beta gamma"] * 40),
        }
    )
    out = heaps_law(rd.from_arrow(t)).to_pandas().iloc[0]
    assert out["beta"] == 0.0
    assert out["ln_k"] == round(math.log(3), 6)
    assert out["r2"] == 1.0


def test_srm_matches_bincount():
    ids = [f"doc{i}" for i in range(2000)]
    t = pa.table({"doc_id": pa.array(ids)})
    out = srm_check(rd.from_arrow(t), n_arms=2).to_pandas().iloc[0]
    from ocr_platform_ray.md5np import md5_u32

    arm = (md5_u32(pa.array(ids)) % np.uint32(2)).astype(np.int64)
    c = np.bincount(arm, minlength=2)
    assert out["n_rows"] == 2000
    assert out["min_arm"] == c.min() and out["max_arm"] == c.max()
    e = 1000.0
    chi2 = sum((float(x) - e) ** 2 / e for x in c)
    assert out["chi2"] == round(chi2, 6)
    assert out["z"] == round((c[0] - c[1]) / math.sqrt(2000.0), 6)
    # a healthy deterministic split should not scream SRM
    assert out["chi2"] < 11.0  # ~p > 0.001 at 1 dof


def test_hill_pareto_recovers_alpha():
    """Pareto(alpha) sample: the Hill estimator should land near the
    true exponent. Deterministic inverse-CDF sample, alpha = 2."""
    alpha = 2.0
    n = 3000
    u = (np.arange(n) + 0.5) / n
    x = np.ceil(100.0 * (1.0 - u) ** (-1.0 / alpha)).astype(np.int64)
    t = pa.table(
        {
            "source": pa.array(["s"] * n),
            "doc_id": pa.array([f"d{i:05d}" for i in range(n)]),
            "n_chars": pa.array(x, pa.int64()),
        }
    )
    out = hill_tail_by_group(rd.from_arrow(t), k=100).to_pandas()
    assert len(out) == 1
    a = out.iloc[0]["alpha"]
    assert 1.5 < a < 2.6, a


def test_hill_skips_small_groups():
    t = pa.table(
        {
            "source": pa.array(["tiny"] * 50),
            "doc_id": pa.array([f"d{i}" for i in range(50)]),
            "n_chars": pa.array(list(range(1, 51)), pa.int64()),
        }
    )
    out = hill_tail_by_group(rd.from_arrow(t), k=100).to_pandas()
    assert len(out) == 0  # needs k+1 = 101 rows


def test_hill_all_equal_tail_is_null():
    t = pa.table(
        {
            "source": pa.array(["s"] * 200),
            "doc_id": pa.array([f"d{i}" for i in range(200)]),
            "n_chars": pa.array([7] * 200, pa.int64()),
        }
    )
    out = hill_tail_by_group(rd.from_arrow(t), k=100).to_pandas()
    assert len(out) == 1 and pd.isna(out.iloc[0]["alpha"])


def test_wilson_planted():
    t = pa.table(
        {
            "source": pa.array(["a"] * 100 + ["b"] * 4),
            "has_digit": pa.array([True] * 30 + [False] * 70
                                  + [True] * 4),
        }
    )
    out = wilson_ci_by_group(
        rd.from_arrow(t), "source", "has_digit"
    ).to_pandas().set_index("source")
    # a: p=0.3, n=100 — textbook Wilson
    z = 1.96
    p, n = 0.3, 100.0
    den = 1.0 + z * z / n
    ctr = (p + z * z / (2 * n)) / den
    hw = z * math.sqrt(p * 0.7 / n + z * z / (4 * n * n)) / den
    assert out.loc["a", "p_hat"] == 0.3
    assert out.loc["a", "ci_lo"] == round(ctr - hw, 6)
    assert out.loc["a", "ci_hi"] == round(ctr + hw, 6)
    # b: p_hat = 1 — Wilson stays inside [0, 1], upper < 1 is false
    # here (p=1 -> hi = 1 boundary), lower well below 1
    assert out.loc["b", "p_hat"] == 1.0
    assert out.loc["b", "ci_lo"] < 1.0
    assert out.loc["b", "ci_hi"] <= 1.0 + 1e-9
