"""Text analysis over a (doc_id, text, ...) table: token counting, quality
scoring, language ID, document fingerprinting. All vectorized per batch
(pyarrow.compute / polars), no Python loop over rows in hot paths.

These generalize the reference's postprocess hook ("TODO: spell
correction, normalization, domain dictionaries" — /root/reference/libs/
ocr_core/ocr_core/pipeline/postprocess.py:5) into the analysis stages a
100 TB training-data pipeline needs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = "[a-z0-9]+"           # lowercase corpus; kept in sync with oracle SQL
ALPHA_RE = "[a-z]"

# tiny per-language stopword profiles for the n-gram/stopword heuristic
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "fr": ["le", "la", "et", "les", "des", "un", "est"],
    "es": ["el", "los", "de", "y", "que", "en", "es"],
    "de": ["der", "die", "und", "das", "ein", "ist", "nicht"],
    "zh": ["de", "shi", "le", "zai", "you", "wo", "ta"],
}
_LANGS = sorted(LANG_STOPWORDS)


def token_count_batch(batch: pa.Table) -> pa.Table:
    """Add n_tokens (regex word count) — SQL: len(regexp_extract_all(...))."""
    n = pc.count_substring_regex(batch.column("text"), pattern=TOKEN_RE)
    return batch.append_column("n_tokens", pc.cast(n, pa.int64()))


def quality_batch(batch: pa.Table) -> pa.Table:
    """Add quality-signal columns (length/alpha ratio/score), rounded to 6dp
    so the DuckDB oracle hashes identically."""
    text = batch.column("text")
    n_chars = pc.cast(pc.utf8_length(text), pa.float64())
    n_alpha = pc.cast(pc.count_substring_regex(text, pattern=ALPHA_RE), pa.float64())
    n_tok = pc.cast(pc.count_substring_regex(text, pattern=TOKEN_RE), pa.float64())
    denom = pc.max_element_wise(n_chars, pa.scalar(1.0))
    # DuckDB rounds half away from zero; association order mirrored in the SQL
    alpha_ratio = pc.round(
        pc.divide(n_alpha, denom), ndigits=6, round_mode="half_towards_infinity"
    )
    score = pc.round(
        pc.multiply(
            pc.min_element_wise(pc.divide(n_tok, pa.scalar(100.0)), pa.scalar(1.0)),
            pc.divide(n_alpha, denom),
        ),
        ndigits=6,
        round_mode="half_towards_infinity",
    )
    out = batch.append_column("n_tokens", pc.cast(n_tok, pa.int64()))
    out = out.append_column("alpha_ratio", alpha_ratio)
    return out.append_column("quality_score", score)


def langid_batch(batch: pa.Table) -> pa.Table:
    """Add pred_lang via stopword-profile scoring (vectorized regex counts
    per language; argmax, ties by language-code order). Heuristic — not
    SQL-expressible; driver records a rows-only check."""
    text = batch.column("text")
    scores = np.zeros((batch.num_rows, len(_LANGS)), dtype=np.int64)
    for j, lang in enumerate(_LANGS):
        pattern = r"\b(" + "|".join(LANG_STOPWORDS[lang]) + r")\b"
        scores[:, j] = pc.count_substring_regex(text, pattern=pattern).to_numpy(
            zero_copy_only=False
        )
    best = scores.argmax(axis=1)  # first max -> language-code order ties
    pred = pa.array([_LANGS[i] for i in best])
    conf = scores.max(axis=1) / np.maximum(scores.sum(axis=1), 1)
    conf = np.floor(conf * 1e6 + 0.5) / 1e6  # half away from zero, like DuckDB
    out = batch.append_column("pred_lang", pred)
    return out.append_column("lang_conf", pa.array(conf))


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Add fp64: stable 64-bit content fingerprint of the text (polars
    vectorized hash — Rust, no Python loop). Used as the exact-dedup /
    shuffle key so wide text never has to move through a groupby."""
    import polars as pl

    s = pl.from_arrow(batch.column("text"))
    if isinstance(s, pl.DataFrame):  # polars>=1 returns Series for ChunkedArray
        s = s.to_series()
    fp = s.hash(seed=0).cast(pl.Int64, wrap_numerical=True)
    return batch.append_column("fp64", fp.to_arrow())
