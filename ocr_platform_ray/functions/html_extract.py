"""HTML main-content extraction (boilerplate removal) over a corpus.

The link-density block heuristic follows the public boilerplate-removal
family (Kohlschütter et al. 2010, "Boilerplate Detection Using Shallow
Text Features"; Pomikálek 2011, jusText): strip script/style/head/
comments, split the document into text blocks at block-level tags,
score each block's LINK DENSITY (chars of anchor text vs plain chars),
and keep the low-link-density prose blocks — navigation, footers and
link farms score high and drop out without any site-specific rules.
This is the north-rule "HTML boilerplate strip / DOM heuristics" stage;
the reference's analogue is the postprocess boilerplate strip
(/root/reference/libs/ocr_core/ocr_core/pipeline/postprocess.py:4-6)
generalized from OCR noise to markup corpora.

Scale shape: ROW-LOCAL — one map_batches pass, zero shuffle, no state;
every step (tag strip, block split, anchor extraction, density test,
block re-join) is a vectorized polars expression over the batch, no
Python loop over rows or blocks. The density compare is integer
(link_chars * 10 <= plain_chars * max_density_tenths), so the keep set
is reproducible bit-for-bit anywhere.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

# block-level elements end a text block; inline elements (<a>, <b>, …)
# stay inside so anchor text can be measured per block. The tag NAME
# must end before attributes/self-close ('(?:[\s/][^>]*)?>'), so <pre>
# never matches the 'p' alternative, <abbr> never matches 'a', and
# <header> never matches 'head' (Rust regex: no lookahead available).
_BLOCK_TAG_RE = (
    r"(?i)</?(?:p|div|li|ul|ol|h[1-6]|br|nav|footer|header|section|"
    r"article|aside|table|tbody|tr|td|th|blockquote|body|html)"
    r"(?:[\s/][^>]*)?>"
)
_DROP_RES = (
    r"(?is)<script(?:[\s/][^>]*)?>.*?</script\s*>",
    r"(?is)<style(?:[\s/][^>]*)?>.*?</style\s*>",
    r"(?is)<head(?:[\s/][^>]*)?>.*?</head\s*>",
    r"(?s)<!--.*?-->",
)
_ANCHOR_RE = r"(?is)<a(?:[\s/][^>]*)?>.*?</a\s*>"
_TAG_RE = r"(?s)<[^>]+>"


def escape_html(expr):
    """polars expr: text -> HTML-escaped text (& first, inverse of
    :func:`_unescape`)."""
    return (
        expr.str.replace_all("&", "&amp;", literal=True)
        .str.replace_all("<", "&lt;", literal=True)
        .str.replace_all(">", "&gt;", literal=True)
    )


def _unescape(expr):
    return (
        expr.str.replace_all("&lt;", "<", literal=True)
        .str.replace_all("&gt;", ">", literal=True)
        .str.replace_all("&amp;", "&", literal=True)
    )


def extract_main_html(
    ds: rd.Dataset,
    html_col: str = "html",
    id_col: str = "doc_id",
    max_density_tenths: int = 3,
    out_col: str = "main_text",
) -> rd.Dataset:
    """(id, html) -> (id, main_text): kept blocks joined by ``\\n``, in
    document order; a fully-boilerplate document yields ``""`` (the row
    is preserved). ``max_density_tenths=3`` keeps blocks whose anchor
    text is at most 30% of their plain text."""

    def fn(batch: pa.Table) -> pa.Table:
        import polars as pl

        d = pl.from_arrow(batch.select([id_col, html_col]))
        cleaned = pl.col(html_col)
        for rx in _DROP_RES:
            cleaned = cleaned.str.replace_all(rx, "")
        d = d.with_columns(
            cleaned.str.replace_all(_BLOCK_TAG_RE, "\x00")
            .str.split("\x00")
            .alias("__blocks")
        )
        e = d.select(id_col, "__blocks").explode("__blocks")
        plain = (
            _unescape(
                pl.col("__blocks").str.replace_all(_TAG_RE, "")
            )
            .str.strip_chars()
            .alias("__plain")
        )
        # anchor chars are unescaped like __plain so the density ratio
        # compares like units (an '&amp;' inside an anchor is 1 char)
        link_chars = (
            _unescape(
                pl.col("__blocks")
                .str.extract_all(_ANCHOR_RE)
                .list.join("")
                .str.replace_all(_TAG_RE, "")
            )
            .str.strip_chars()
            .str.len_chars()
            .fill_null(0)
            .cast(pl.Int64)
            .alias("__link")
        )
        e = e.with_columns(plain, link_chars).with_columns(
            (
                (pl.col("__plain").str.len_chars() > 0)
                & (
                    pl.col("__link") * 10
                    <= pl.col("__plain").str.len_chars().cast(pl.Int64)
                    * max_density_tenths
                )
            ).alias("__keep")
        )
        agg = e.group_by(id_col, maintain_order=True).agg(
            pl.col("__plain")
            .filter(pl.col("__keep"))
            .str.join("\n")
            .alias(out_col)
        )
        return agg.to_arrow()

    return ds.map_batches(fn, batch_format="pyarrow")
