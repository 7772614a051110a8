"""Randomized equivalence pins, part 3: the per-source/lang text
profiles and sequence mining — utf8 audit, char classes, line profile,
tokenizer fertility, hour entropy, event trigrams. Seeds FIXED."""

import math
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from ocr_platform_ray.functions.events import event_trigrams, hour_entropy
from ocr_platform_ray.functions.textstats import (
    char_classes,
    line_profile,
    tokenizer_fertility,
    utf8_audit,
)

HOUR_US = 3_600_000_000


def _rand_text(rng):
    alphabet = list("abc XY12.\n\t!?") + ["é", "ß", "\U0001f600"]
    n = int(rng.integers(0, 40))
    return "".join(alphabet[int(i)] for i in rng.integers(0, len(alphabet), n))


@pytest.mark.parametrize("seed", [0, 17])
def test_text_profiles_match_bruteforce(seed):
    rng = np.random.default_rng(seed)
    n = 120
    texts = [_rand_text(rng) for _ in range(n)]
    srcs = [f"s{int(rng.integers(0, 3))}" for _ in range(n)]
    docs = rd.from_arrow(
        pa.table(
            {"source": pa.array(srcs, pa.string()),
             "lang": pa.array(srcs, pa.string()),
             "text": pa.array(texts, pa.string())}
        )
    )
    df = pd.DataFrame({"s": srcs, "t": texts})

    u = utf8_audit(docs).to_pandas().set_index("source")
    cc = char_classes(docs).to_pandas().set_index("source")
    lp = line_profile(docs).to_pandas().set_index("source")
    tf = tokenizer_fertility(docs).to_pandas().set_index("lang")

    for s, sub in df.groupby("s"):
        t = sub["t"]
        over = t.map(lambda x: len(x.encode("utf8")) - len(x))
        assert u.loc[s, "overhead_bytes"] == over.sum()
        assert u.loc[s, "n_multibyte"] == (over > 0).sum()
        ch = t.str.len().sum()
        let = t.map(lambda x: len(re.findall(r"[a-zA-Z]", x))).sum()
        dig = t.map(lambda x: len(re.findall(r"[0-9]", x))).sum()
        ws = t.map(lambda x: len(re.findall(r"[ \t\n\r]", x))).sum()
        if ch:
            assert cc.loc[s, "letter_ratio"] == pytest.approx(
                let / ch, abs=6e-7
            )
            assert cc.loc[s, "digit_ratio"] == pytest.approx(
                dig / ch, abs=6e-7
            )
            assert cc.loc[s, "space_ratio"] == pytest.approx(
                ws / ch, abs=6e-7
            )
        nl = t.str.count("\n").sum()
        lines = nl + len(t)
        assert lp.loc[s, "n_lines"] == lines
        assert lp.loc[s, "avg_line_len"] == pytest.approx(
            (ch - nl) / lines, abs=6e-7
        )
        tok = t.map(
            lambda x: len(
                re.findall(r"'[a-z]+| ?[a-z0-9]+| ?[^a-z0-9 \t\n\r]+", x)
            )
        ).sum()
        assert tf.loc[s, "n_tokens"] == tok
        if tok:
            assert tf.loc[s, "chars_per_token"] == pytest.approx(
                ch / tok, abs=6e-7
            )


@pytest.mark.parametrize("seed", [3])
def test_hour_entropy_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    base = 1_700_000_000_000_000
    base -= base % (24 * HOUR_US)
    n = 400
    hours = rng.integers(0, 24, n)
    types = np.array(["x", "y"])[rng.integers(0, 2, n)]
    ev = rd.from_arrow(
        pa.table(
            {"event_type": pa.array(types, pa.string()),
             "ts": pa.array(
                 [base + int(h) * HOUR_US + int(i)
                  for i, h in enumerate(hours)],
                 pa.timestamp("us"))}
        )
    )
    out = hour_entropy(ev).to_pandas().set_index("event_type")
    df = pd.DataFrame({"t": types, "h": hours})
    for t, sub in df.groupby("t"):
        cnt = sub["h"].value_counts()
        p = cnt / cnt.sum()
        ent = float(-(p * p.map(math.log)).sum())
        assert out.loc[t, "hour_entropy_nats"] == pytest.approx(
            ent, abs=6e-7
        )
        assert out.loc[t, "n_active_hours"] == len(cnt)


@pytest.mark.parametrize("seed", [6])
def test_event_trigrams_match_bruteforce(seed):
    rng = np.random.default_rng(seed)
    uid = rng.integers(0, 25, 500).astype(np.int64)
    et = np.array(["a", "b", "c", "d"])[rng.integers(0, 4, 500)]
    ev = rd.from_arrow(
        pa.table(
            {"event_id": pa.array(np.arange(500, dtype=np.int64)),
             "user_id": pa.array(uid),
             "ts": pa.array(
                 np.arange(500, dtype=np.int64) * 1000,
                 pa.timestamp("us")),
             "event_type": pa.array(et, pa.string())}
        )
    )
    got = event_trigrams(ev, k=10).to_pandas()
    df = pd.DataFrame({"u": uid, "e": et, "i": np.arange(500)})
    tris: dict = {}
    for _, sub in df.sort_values(["u", "i"]).groupby("u"):
        e = sub["e"].tolist()
        for a, b, c in zip(e, e[1:], e[2:]):
            tris[(a, b, c)] = tris.get((a, b, c), 0) + 1
    want = sorted(tris.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [tuple(r) for r in got[["e1", "e2", "e3"]].values] == [
        w[0] for w in want
    ]
    assert got["n"].tolist() == [w[1] for w in want]
