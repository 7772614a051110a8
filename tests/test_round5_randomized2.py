"""Randomized equivalence pins, part 2: Brown–Forsythe, basket pairs,
reorder cadence, conversion lag, segment profile / audience overlap,
and the dup-bytes ledger — each seeded random input is re-computed
independently with pandas/numpy brute force. Seeds FIXED."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from ocr_platform_ray.functions.dedup import dup_bytes_by_source
from ocr_platform_ray.functions.events import (
    conversion_lag_quantiles,
    type_user_overlap,
    user_segment_profile,
)
from ocr_platform_ray.functions.relational import (
    basket_pairs,
    brown_forsythe,
    reorder_cadence,
)

DAY_US = 86_400_000_000


@pytest.mark.parametrize("seed", [0, 5])
def test_brown_forsythe_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    groups, vals = [], []
    k = int(rng.integers(2, 5))
    for g in range(k):
        n = int(rng.integers(3, 30))
        groups += [f"g{g}"] * n
        vals += rng.integers(0, 500, n).tolist()
    ds = rd.from_arrow(
        pa.table({"g": pa.array(groups, pa.string()),
                  "x": pa.array(vals, pa.int64())})
    )
    out = brown_forsythe(ds, "g", "x").to_pandas()
    df = pd.DataFrame({"g": groups, "x": vals})
    # z = |x - median_g|; F is scale-invariant so w = 2z matches
    df["z"] = df.groupby("g")["x"].transform(lambda s: (s - s.median()).abs())
    grand = df["z"].mean()
    ssb = sum(len(s) * (s.mean() - grand) ** 2
              for _, s in df.groupby("g")["z"])
    ssw = sum(((s - s.mean()) ** 2).sum() for _, s in df.groupby("g")["z"])
    N = len(df)
    f = (ssb / (k - 1)) / (ssw / (N - k))
    assert out["f_bf"].iloc[0] == pytest.approx(f, abs=6e-7)


@pytest.mark.parametrize("seed", [2, 11])
def test_basket_pairs_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    orders = rng.integers(0, 60, 400).astype(np.int64)
    parts = rng.integers(0, 25, 400).astype(np.int64)
    li = rd.from_arrow(
        pa.table({"l_orderkey": pa.array(orders),
                  "l_partkey": pa.array(parts)})
    )
    got = basket_pairs(li, k=10).to_pandas()
    lp = pd.DataFrame({"o": orders, "p": parts}).drop_duplicates()
    m = lp.merge(lp, on="o")
    m = m[m["p_x"] < m["p_y"]]
    cnt = m.groupby(["p_x", "p_y"]).size().reset_index(name="n")
    cnt = cnt.sort_values(["n", "p_x", "p_y"],
                          ascending=[False, True, True]).head(10)
    assert got[["p1", "p2", "n_pair"]].values.tolist() == \
        cnt[["p_x", "p_y", "n"]].values.tolist()
    pc_ = lp.groupby("p").size()
    n_orders = lp["o"].nunique()
    for _, r in got.iterrows():
        lift = r["n_pair"] * n_orders / (pc_[r["p1"]] * pc_[r["p2"]])
        assert r["lift"] == pytest.approx(lift, abs=6e-7)


@pytest.mark.parametrize("seed", [4])
def test_reorder_cadence_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    n_cust = 40
    segs = {c: ["S1", "S2"][int(rng.integers(0, 2))] for c in range(n_cust)}
    ck, days = [], []
    for c in range(n_cust):
        for _ in range(int(rng.integers(1, 8))):
            ck.append(c)
            days.append(int(rng.integers(0, 400)))
    orders = rd.from_arrow(
        pa.table(
            {"o_custkey": pa.array(ck, pa.int64()),
             "o_orderdate": pa.array(
                 [d * DAY_US for d in days], pa.timestamp("us"))}
        )
    )
    cust = rd.from_arrow(
        pa.table(
            {"c_custkey": pa.array(list(segs), pa.int64()),
             "c_mktsegment": pa.array(
                 [segs[c] for c in segs], pa.string())}
        )
    )
    got = reorder_cadence(orders, cust).to_pandas().set_index("mktsegment")
    df = pd.DataFrame({"c": ck, "d": days})
    gaps: dict = {"S1": [], "S2": []}
    for c, sub in df.groupby("c"):
        d = np.diff(np.sort(sub["d"].to_numpy()))
        gaps[segs[c]] += d.tolist()
    for s in ("S1", "S2"):
        if not gaps[s]:
            assert s not in got.index
            continue
        assert got.loc[s, "n_gaps"] == len(gaps[s])
        assert got.loc[s, "p50_days"] == pytest.approx(
            np.quantile(gaps[s], 0.5, method="linear"), abs=6e-7
        )
        assert got.loc[s, "p90_days"] == pytest.approx(
            np.quantile(gaps[s], 0.9, method="linear"), abs=6e-7
        )


@pytest.mark.parametrize("seed", [8])
def test_conversion_lag_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    uid, et, day = [], [], []
    for u in range(60):
        for _ in range(int(rng.integers(1, 6))):
            uid.append(u)
            et.append(["signup", "purchase", "view"][int(rng.integers(0, 3))])
            day.append(int(rng.integers(0, 90)))
    ev = rd.from_arrow(
        pa.table(
            {"user_id": pa.array(uid, pa.int64()),
             "event_type": pa.array(et, pa.string()),
             "ts": pa.array([d * DAY_US for d in day], pa.timestamp("us"))}
        )
    )
    got = conversion_lag_quantiles(ev).to_pandas()
    df = pd.DataFrame({"u": uid, "e": et, "d": day})
    s = df[df["e"] == "signup"].groupby("u")["d"].min()
    p = df[df["e"] == "purchase"].groupby("u")["d"].min()
    both = pd.concat([s.rename("s"), p.rename("p")], axis=1).dropna()
    lag = (both["p"] - both["s"]).astype(int)
    lag = lag[lag >= 0].to_numpy()
    assert got["n_converted"].tolist() == [len(lag)]
    assert got["p50_days"].iloc[0] == pytest.approx(
        np.quantile(lag, 0.5, method="linear"), abs=6e-7
    )


@pytest.mark.parametrize("seed", [13])
def test_segment_profile_and_overlap_match_bruteforce(seed):
    rng = np.random.default_rng(seed)
    uid = rng.integers(0, 50, 300).astype(np.int64)
    et = np.array(["a", "b", "c"])[rng.integers(0, 3, 300)]
    ev = rd.from_arrow(
        pa.table({"user_id": pa.array(uid),
                  "event_type": pa.array(et, pa.string())})
    )
    prof = user_segment_profile(ev).to_pandas()
    ovl = type_user_overlap(ev).to_pandas()
    df = pd.DataFrame({"u": uid, "e": et}).drop_duplicates()
    types = sorted(df["e"].unique())
    bit = {t: 1 << i for i, t in enumerate(types)}
    masks = df.assign(p=df["e"].map(bit)).groupby("u")["p"].sum()
    want = masks.value_counts().sort_index()
    assert prof["mask"].tolist() == want.index.tolist()
    assert prof["n_users"].tolist() == want.tolist()
    sets = {t: set(df[df["e"] == t]["u"]) for t in types}
    for _, r in ovl.iterrows():
        a, b = sets[r["t1"]], sets[r["t2"]]
        assert r["n_both"] == len(a & b)
        assert r["n_either"] == len(a | b)


@pytest.mark.parametrize("seed", [21])
def test_dup_bytes_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    pool = [f"text number {i} with some padding" for i in range(30)]
    n = 200
    texts = [pool[int(rng.integers(0, 30))] for _ in range(n)]
    srcs = [f"s{int(rng.integers(0, 4))}" for _ in range(n)]
    docs = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(list(range(n)), pa.int64()),
             "source": pa.array(srcs, pa.string()),
             "text": pa.array(texts, pa.string())}
        )
    )
    got = dup_bytes_by_source(docs).to_pandas().set_index("source")
    df = pd.DataFrame({"i": range(n), "s": srcs, "t": texts})
    keeper = df.groupby("t")["i"].min()
    dups = df[df["i"] != df["t"].map(keeper)]
    want_n = dups.groupby("s").size()
    want_b = dups.assign(b=dups["t"].str.len()).groupby("s")["b"].sum()
    for s in want_n.index:
        assert got.loc[s, "n_dup_docs"] == want_n[s]
        assert got.loc[s, "bytes_reclaimable"] == want_b[s]
