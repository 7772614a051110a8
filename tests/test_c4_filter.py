"""Planted pins for the C4-style line filter (Raffel et al. 2020 §2.2):
every rule exercised on handcrafted pages, plus the q_c4_filter
engine-vs-DuckDB equality at sf0.001 (both bigger scales are swept by
tools/check_correctness.py)."""

import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.textstats import c4_line_filter


def _run(pages: dict[int, str], **kw):
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(pages), pa.int64()),
                "page": pa.array(list(pages.values()), pa.string()),
            }
        )
    )
    out = c4_line_filter(ds, **kw).to_pandas()
    return {
        int(r.doc_id): (r.clean_text, int(r.n_lines), int(r.n_kept))
        for r in out.itertuples()
    }


GOOD = "one two three four five six seven eight."


def test_line_rules_each_bite():
    page = "\n".join(
        [
            GOOD,  # kept
            "one two three four five!  ",  # kept: '!' + trailing spaces ok
            "ends with no punctuation at all",  # dropped: no terminal punct
            "too few words here.",  # dropped: 4 words < 5
            "enable JavaScript to view this content.",  # dropped: javascript
            'he said "stop it now." )',  # dropped: ')' after space isn't punct-adjacent
            'he said "stop it now.")',  # kept: punct + closing quote/bracket
        ]
    )
    got = _run({1: page})
    clean, n_lines, n_kept = got[1]
    assert n_lines == 7 and n_kept == 3
    assert clean.split("\n") == [
        GOOD,
        "one two three four five!  ",
        'he said "stop it now.")',
    ]


def test_doc_rules_drop_whole_page():
    three_good = "\n".join([GOOD] * 3)
    got = _run(
        {
            1: three_good,  # kept: exactly 3 surviving lines
            2: three_good + "\nvar x = { a: 1 };",  # dropped: '{'
            3: "Lorem Ipsum dolor sit amet.\n" + three_good,  # dropped: case-insensitive
            4: "\n".join([GOOD] * 2),  # dropped: 2 < 3 kept lines
        }
    )
    assert set(got) == {1}
    assert got[1] == (three_good, 3, 3)


def test_thresholds_are_parameters():
    got = _run({1: GOOD}, min_kept_lines=1, min_words=8)
    assert got[1] == (GOOD, 1, 1)
    assert _run({1: "one two three."}, min_kept_lines=1) == {}


def test_q_c4_filter_matches_duckdb_sf0001():
    import duckdb

    from ocr_platform_ray.queries import oracle_sql, q_c4_filter

    sf = "/root/testdata/sf0.001"
    got = (
        q_c4_filter(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT *"
        f" FROM read_parquet('{sf}/documents.parquet')"
    )
    want = (
        con.execute(oracle_sql()["q_c4_filter"])
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    for c in ["doc_id", "clean_text", "n_lines", "n_kept"]:
        assert got[c].tolist() == want[c].tolist(), c
