"""Planted pins for round-5 batch 40: event-type trigram mining, UTF-8
overhead audit, inter-arrival gap quartiles. Registry equality vs DuckDB
at sf0.01/sf0.1 is swept by tools/check_correctness.py."""

import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.events import event_trigrams, gap_quantiles
from ocr_platform_ray.functions.textstats import utf8_audit

DAY_US = 86_400_000_000


def _events(specs):
    """specs: (event_id, user_id, ts_us, event_type)."""
    return rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array([s[0] for s in specs], pa.int64()),
                "user_id": pa.array([s[1] for s in specs], pa.int64()),
                "ts": pa.array([s[2] for s in specs], pa.timestamp("us")),
                "event_type": pa.array([s[3] for s in specs], pa.string()),
            }
        )
    )


def test_event_trigrams_planted():
    sp = []
    # user 1: a b a b -> (a,b,a), (b,a,b); user 2: a b a -> (a,b,a)
    for i, et in enumerate(["a", "b", "a", "b"]):
        sp.append((i, 1, i * 1000, et))
    for i, et in enumerate(["a", "b", "a"]):
        sp.append((10 + i, 2, i * 1000, et))
    # user 3: only two events -> contributes nothing
    sp += [(20, 3, 0, "a"), (21, 3, 1000, "b")]
    out = event_trigrams(_events(sp)).to_pandas()
    assert out[["e1", "e2", "e3"]].values.tolist() == [
        ["a", "b", "a"],
        ["b", "a", "b"],
    ]
    assert out["n"].tolist() == [2, 1]


def test_event_trigrams_tie_order_deterministic():
    sp = []
    # two distinct trigrams each once: ordering falls to (e1,e2,e3)
    for i, et in enumerate(["x", "y", "z"]):
        sp.append((i, 1, i * 1000, et))
    for i, et in enumerate(["a", "b", "c"]):
        sp.append((10 + i, 2, i * 1000, et))
    out = event_trigrams(_events(sp)).to_pandas()
    assert out[["e1", "e2", "e3"]].values.tolist() == [
        ["a", "b", "c"],
        ["x", "y", "z"],
    ]


def test_utf8_audit_planted():
    docs = rd.from_arrow(
        pa.table(
            {
                "source": pa.array(["s1", "s1", "s2"], pa.string()),
                "text": pa.array(["abc", "café", "\U0001f600!"], pa.string()),
            }
        )
    )
    out = utf8_audit(docs).to_pandas().set_index("source")
    # s1: "abc" 0 overhead; "café" 5 bytes / 4 chars -> 1
    assert out.loc["s1", "n_docs"] == 2
    assert out.loc["s1", "n_multibyte"] == 1
    assert out.loc["s1", "overhead_bytes"] == 1
    assert out.loc["s1", "overhead_ratio"] == round(1 / 7, 6)
    # s2: emoji = 4 bytes 1 char (+ "!") -> overhead 3 of 2 chars
    assert out.loc["s2", "overhead_bytes"] == 3
    assert out.loc["s2", "overhead_ratio"] == 1.5


def test_gap_quantiles_planted():
    base = 1_700_000_000_000_000
    base -= base % DAY_US
    # gaps 10, 20, 30, 40 s -> p25=17.5, p50=25, p75=32.5
    ts = [base]
    for g in (10, 20, 30, 40):
        ts.append(ts[-1] + g * 1_000_000)
    ev = _events([(i, 1, t, "x") for i, t in enumerate(ts)])
    out = gap_quantiles(ev.select_columns(["event_type", "ts"])).to_pandas()
    assert out["n_gaps"].tolist() == [4]
    assert out["p25"].tolist() == [17.5]
    assert out["p50"].tolist() == [25.0]
    assert out["p75"].tolist() == [32.5]


def test_gap_quantiles_boundary_and_single_dropped():
    base = 1_700_000_000_000_000
    base -= base % DAY_US
    # type x: events on day 0 (t=0) and day 1 (t=+5s): one 86405 s gap
    ev = _events(
        [
            (0, 1, base, "x"),
            (1, 1, base + DAY_US + 5_000_000, "x"),
            (2, 2, base, "lonely"),
        ]
    )
    out = gap_quantiles(ev.select_columns(["event_type", "ts"])).to_pandas()
    assert out["event_type"].tolist() == ["x"]
    assert out["n_gaps"].tolist() == [1]
    assert out["p50"].tolist() == [86405.0]
