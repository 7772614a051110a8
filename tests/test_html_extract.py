"""HTML main-content extraction pinned semantics: link-density block
keep/drop, script/style/head/comment stripping, entity round-trip,
block ordering, all-boilerplate docs preserved as empty rows, and the
sf0.001 wrap->extract round-trip identity vs DuckDB."""

import duckdb
import pandas as pd

import ray.data as rd

SF = "/root/testdata/sf0.001"


def _extract(rows):
    from ocr_platform_ray.functions.html_extract import extract_main_html

    ds = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": list(range(len(rows))), "html": rows}
        )
    ).repartition(2)
    out = extract_main_html(ds).to_pandas()
    return dict(zip(out["doc_id"], out["main_text"]))


class TestExtractMainHtml:
    def test_boilerplate_blocks_drop_content_stays(self, ray_session):
        page = (
            "<html><head><title>T</title></head><body>"
            '<nav><a href="#">Home</a> | <a href="#">About</a></nav>'
            "<p>This is the real article text, long enough to matter.</p>"
            "<p>Second paragraph of prose without any links at all.</p>"
            '<footer><a href="#">Contact</a> <a href="#">Terms</a></footer>'
            "</body></html>"
        )
        got = _extract([page])[0]
        assert got == (
            "This is the real article text, long enough to matter.\n"
            "Second paragraph of prose without any links at all."
        )

    def test_link_density_boundary(self, ray_session):
        # exactly 30% anchor chars is KEPT (<=), just above is dropped
        kept = "<p><a>abc</a>defghij</p>"        # 3 of 10 -> keep
        dropped = "<p><a>abcd</a>defghij</p>"     # 4 of 11 -> drop
        got = _extract([kept + dropped])[0]
        assert got == "abcdefghij"

    def test_script_style_head_comment_stripped(self, ray_session):
        page = (
            "<head><title>skip me</title></head>"
            "<script>var x = '<p>fake</p>';</script>"
            "<style>p { color: red }</style>"
            "<!-- <p>comment</p> --><p>real</p>"
        )
        assert _extract([page])[0] == "real"

    def test_entities_unescaped(self, ray_session):
        assert (
            _extract(["<p>a &lt;b&gt; &amp; c</p>"])[0] == "a <b> & c"
        )

    def test_all_boilerplate_doc_preserved_empty(self, ray_session):
        got = _extract(
            ['<nav><a href="#">x</a><a href="#">y</a></nav>', "<p>hi</p>"]
        )
        assert got[0] == "" and got[1] == "hi"

    def test_inline_tags_stay_in_block(self, ray_session):
        # <b>/<i> are inline: no block split, text joined in one block
        assert _extract(["<p>one <b>two</b> three</p>"])[0] == (
            "one two three"
        )

    def test_sf0001_roundtrip_matches_duckdb(self, ray_session):
        import __ray_entry__ as entry

        out = entry.queries()["q_main_content"](SF).to_pandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT *"
            f" FROM read_parquet('{SF}/documents.parquet')"
        )
        ref = con.execute(entry.oracle_sql()["q_main_content"]).df()
        got = out.sort_values("doc_id").reset_index(drop=True)
        want = ref.sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestTagNamePrecision:
    def test_inline_tags_sharing_prefix_with_anchor(self, ray_session):
        # <abbr>/<area> must NOT be treated as anchors: this prose block
        # has one tiny real link and must be kept
        page = (
            "<p><abbr>HTML</abbr> is a long piece of plain prose text"
            ' here with enough characters <a href="#">x</a></p>'
        )
        got = _extract([page])[0]
        assert got.startswith("HTML is a long piece")

    def test_pre_and_header_not_block_or_head_matched(self, ray_session):
        # <pre> must not match the 'p' block alternative mid-name, and
        # <header> must not be swallowed by the <head> dropper
        page = (
            "<header><a>Nav</a><a>Bar</a></header>"
            "<p>keep this prose</p><pre>code text</pre>"
        )
        got = _extract([page])[0]
        assert "keep this prose" in got
        assert "code text" in got
        assert "Nav" not in got

    def test_entities_inside_anchor_counted_unescaped(self, ray_session):
        # anchor text 'R&D' is 3 chars (25% of 'R&D rest here' is wrong
        # math — of the 12-char plain text) -> keep
        page = "<p><a>R&amp;D</a> lab notes x</p>"
        assert _extract([page])[0] == "R&D lab notes x"

    def test_self_closing_br_splits_blocks(self, ray_session):
        assert _extract(["<p>one<br/>two</p>"])[0] == "one\ntwo"
