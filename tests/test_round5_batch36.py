"""Planted pins for round-5 batch 36: daily p-chart and boilerplate
head-prefix detector. Registry equality vs DuckDB at sf0.01/sf0.1 is
swept by tools/check_correctness.py."""

import math

import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.events import p_chart_daily
from ocr_platform_ray.functions.textstats import head_prefixes

DAY_US = 86_400_000_000


def _events(day_specs):
    """day_specs: list of (n_ok, n_err) per day."""
    base = 1_700_000_000_000_000
    base -= base % DAY_US
    types, ts = [], []
    for d, (ok, err) in enumerate(day_specs):
        for k in range(ok):
            types.append("view")
            ts.append(base + d * DAY_US + k * 1000)
        for k in range(err):
            types.append("error")
            ts.append(base + d * DAY_US + 500_000 + k * 1000)
    return rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "ts": pa.array(ts, pa.timestamp("us")),
            }
        )
    )


def test_p_chart_planted():
    # steady ~10% error rate, one day spikes to 60%
    specs = [(90, 10)] * 5 + [(40, 60)] + [(90, 10)] * 4
    out = p_chart_daily(_events(specs)).to_pandas().sort_values("day")
    tot_err = 10 * 9 + 60
    tot = 100 * 10
    pbar = tot_err / tot
    half = 3.0 * math.sqrt(pbar * (1 - pbar) / 100.0)
    assert out["n"].tolist() == [100] * 10
    row = out.iloc[5]
    assert row["p"] == 0.6
    assert row["breach"] == 1
    assert row["ucl"] == round(min(pbar + half, 1.0), 6)
    assert out["breach"].sum() == 1  # only the spike day


def test_p_chart_small_day_wider_limits():
    # a 4-event day has much wider limits than a 400-event day
    specs = [(3, 1), (360, 40)]
    out = p_chart_daily(_events(specs)).to_pandas().sort_values("day")
    w_small = out.iloc[0]["ucl"] - out.iloc[0]["lcl"]
    w_big = out.iloc[1]["ucl"] - out.iloc[1]["lcl"]
    assert w_small > w_big * 3


def _docs(rows):
    return rd.from_arrow(
        pa.table(
            {
                "source": pa.array([r[0] for r in rows], pa.string()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_head_prefixes_detects_template():
    rows = (
        [("s1", "BREAKING NEWS -- story %d here" % i) for i in range(8)]
        + [("s1", "totally organic text %d" % i) for i in range(2)]
        + [("s2", "unique opener %d blah" % i) for i in range(3)]
    )
    out = head_prefixes(_docs(rows), prefix_len=16, k=5).to_pandas()
    s1 = out[out["source"] == "s1"]
    top = s1[s1["rank"] == 1].iloc[0]
    assert top["prefix"] == "BREAKING NEWS --"
    assert top["n_docs"] == 8
    assert top["share"] == 0.8


def test_head_prefixes_rank_ties_by_prefix():
    rows = [("s", "aaaa x"), ("s", "bbbb y")]
    out = head_prefixes(_docs(rows), prefix_len=4, k=5).to_pandas()
    assert out["prefix"].tolist() == ["aaaa", "bbbb"]  # count tie -> asc
    assert out["rank"].tolist() == [1, 2]
