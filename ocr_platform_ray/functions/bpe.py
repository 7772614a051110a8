"""BPE tokenizer training + encoding over the corpus.

Byte-pair-encoding subword training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units" — public
knowledge) operates on the corpus WORD-FREQUENCY DICTIONARY, not the raw
text: the only corpus-sized pass is the distributed word count
(:func:`textstats.vocab_counts`, one coarse-bucketed integer-partial
shuffle); the merge loop then runs over the distinct-word table, which
is orders of magnitude smaller than the corpus (and at true web scale is
frequency-pruned to a top-N dictionary first — standard practice, the
``max_dict`` guard below names that escape hatch loudly).

This generalizes the reference's fixed-vocabulary recognizer (VietOCR's
static char vocab, /root/reference/libs/ocr_core/ocr_core/engines/
vietocr_engine.py:40-47) into the learned-subword tokenization step an
LLM data pipeline runs before packing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd


def bpe_train(ds: rd.Dataset, n_merges: int = 40,
              max_dict: int = 5_000_000) -> pa.Table:
    """Learn ``n_merges`` BPE merges from the corpus word dictionary.

    Word-internal merges over ``[a-z0-9]+`` tokens (no end-of-word
    marker — the repo token contract has no intra-word whitespace to
    protect). Deterministic: each round merges the pair with the highest
    frequency, ties broken by lexicographically smallest (left, right);
    stops early when no pair repeats. Returns (rank, left, right, n) —
    ``n`` is the pair's weighted count at merge time.

    The driver holds only the distinct-word dictionary (LOUD ``max_dict``
    guard; the 100 TB path prunes to a top-N dictionary first, which
    changes counts only below the frequency floor)."""
    from .textstats import vocab_counts

    rows = vocab_counts(ds).take_all()
    if len(rows) > max_dict:
        raise ValueError(
            f"bpe_train: {len(rows)} distinct words exceeds "
            f"max_dict={max_dict}; prune to a top-N dictionary "
            "(heavy_hitter_tokens / unigram_logprob_topn shape) first"
        )
    words: dict[tuple[str, ...], int] = {}
    for r in rows:
        words[tuple(r["token"])] = int(r["n"])

    out_rank, out_left, out_right, out_n = [], [], [], []
    for rank in range(int(n_merges)):
        pair_counts: dict[tuple[str, str], int] = {}
        for sym, c in words.items():
            for a, b in zip(sym, sym[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
        if not pair_counts:
            break
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        n_best = pair_counts[best]
        if n_best < 2:
            break  # nothing repeats; further merges are arbitrary
        a, b = best
        ab = a + b
        nxt: dict[tuple[str, ...], int] = {}
        for sym, c in words.items():
            merged = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    merged.append(ab)
                    i += 2
                else:
                    merged.append(sym[i])
                    i += 1
            key = tuple(merged)
            nxt[key] = nxt.get(key, 0) + c
        words = nxt
        out_rank.append(rank)
        out_left.append(a)
        out_right.append(b)
        out_n.append(n_best)
    return pa.table(
        {
            "rank": pa.array(out_rank, pa.int64()),
            "left": pa.array(out_left, pa.string()),
            "right": pa.array(out_right, pa.string()),
            "n": pa.array(out_n, pa.int64()),
        }
    )


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first BPE encode of one word (the GPT-2-style
    application order: repeatedly merge the present pair with the
    smallest training rank)."""
    sym = list(word)
    while len(sym) > 1:
        best_i, best_rank = -1, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_i, best_rank = i, r
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode_counts(ds: rd.Dataset, merges: pa.Table,
                      id_col: str = "doc_id") -> rd.Dataset:
    """Per-doc BPE token counts under trained ``merges`` — the
    tokenizer-application pass that sizes a packed pre-training corpus.

    Row-local, zero shuffle: the merge table broadcasts once
    (``ray.put``), each batch encodes only its DISTINCT words (memoized
    — the per-word Python merge loop runs once per distinct word per
    batch, not once per occurrence) and a vectorized join maps symbol
    counts back onto rows. Returns (id, n_words, n_bpe_tokens)."""
    import polars as pl
    import ray

    from . import resolve_broadcast
    from .textstats import TOKEN_RE

    pairs = list(
        zip(merges.column("left").to_pylist(),
            merges.column("right").to_pylist())
    )
    ref = ray.put({p: i for i, p in enumerate(pairs)})

    def encode(batch: pa.Table) -> pa.Table:
        ranks = resolve_broadcast(ref)
        col = batch.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        ex = (
            pl.DataFrame({"id": pl.from_arrow(ids), "t": pl.from_arrow(col)})
            .select("id", pl.col("t").str.extract_all(TOKEN_RE).alias("w"))
            .explode("w")
        )
        # the only Python loop runs once per DISTINCT word in the batch
        uniq = ex["w"].drop_nulls().unique().to_list()
        lens = pl.DataFrame(
            {"w": pl.Series(uniq, dtype=pl.Utf8),
             "bl": np.array([len(encode_word(w, ranks)) for w in uniq],
                            np.int64)}
        )
        # empty docs explode to a single null-word row, so every doc
        # survives the groupby with nw=0, nb=0
        agg = (
            ex.join(lens, on="w", how="left")
            .group_by("id", maintain_order=True)
            .agg(
                pl.col("w").is_not_null().sum().cast(pl.Int64).alias("nw"),
                pl.col("bl").sum().fill_null(0).cast(pl.Int64).alias("nb"),
            )
        )
        return pa.table(
            {
                id_col: pa.array(agg["id"].to_list(), ids.type),
                "n_words": pa.array(agg["nw"].to_numpy(), pa.int64()),
                "n_bpe_tokens": pa.array(agg["nb"].to_numpy(), pa.int64()),
            }
        )

    return ds.select_columns([id_col, "text"]).map_batches(
        encode, batch_format="pyarrow"
    )
