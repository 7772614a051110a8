"""End-to-end corpus curation: the composed training-data pipeline a user
of this library runs before training — quality gate, exact dedup, split
assignment, per-split budget accounting. One streaming graph built
entirely from the operator library (no new semantics here), proving the
operators compose: filter -> per-batch-combined dedup -> hash join back
for payload columns -> md5 split -> partial aggregation.

Generalizes the reference's per-job progress accounting
(/root/reference/apps/api/app/api/v1/routes_jobs.py job counters) to a
corpus-curation report, SQL-reproducible end to end.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data as rd

from . import textstats
from .dedup import exact_dedup_min_doc, shuffle_blocks, train_test_split
from .joins import hash_join

QUALITY_CUT = 0.5


def curation_summary(ds: rd.Dataset) -> rd.Dataset:
    """(doc_id, text) corpus -> per-split curation report: (split, n_docs,
    tokens) after a quality gate (score >= QUALITY_CUT) and exact text
    dedup (min doc_id survives).

    Scale shape: quality + token counts are row-local; dedup shuffles
    one (hash, min-doc) row per distinct text per batch; survivors
    rejoin their token counts through the native hash join (ids only on
    the build side, never text); split assignment is row-local md5; the
    final groupby moves 3 partial rows per batch."""
    scored = ds.map_batches(textstats.quality_batch, batch_format="pyarrow")
    kept = scored.filter(expr=f"quality_score >= {QUALITY_CUT}")
    survivors = exact_dedup_min_doc(kept.select_columns(["doc_id", "text"]))
    tokens = kept.select_columns(["doc_id", "n_tokens"])
    rejoined = hash_join(survivors, tokens, on="doc_id")
    labeled = train_test_split(rejoined)

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(batch.select(["split", "n_tokens"]))
            .group_by("split")
            .agg(
                pl.len().alias("n_docs"),
                pl.col("n_tokens").sum().alias("tokens"),
            )
            .to_arrow()
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "split": [g["split"].iloc[0]],
                "n_docs": [int(g["n_docs"].sum())],
                "tokens": [int(g["tokens"].sum())],
            }
        )

    return (
        labeled.map_batches(partial, batch_format="pyarrow")
        .repartition(shuffle_blocks())
        .groupby("split")
        .map_groups(final, batch_format="pandas")
        .sort("split")
    )
