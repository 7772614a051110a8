"""Streaming cross-batch dedup against a shared mutable MinHash index.

Batch dedup (functions/dedup.py) needs the whole corpus in one run; an
*arriving* stream of documents needs an index that remembers what it has
already seen across batches — mutable state the Dataset API cannot
express, so this is implemented as raw Ray actors (the escape hatch the
task contract reserves for exactly this case).

Design (sharded, no single bottleneck):
- K ``BandIndexActor``s; actor k owns LSH bands where ``band % K == k``
  (each holds {(band, band_hash) -> first doc_id seen});
- the Dataset stage computes MinHash band rows per batch (the same
  vectorized signature kernel as batch dedup), partitions them by owning
  actor, and issues ONE rpc per actor per batch (K concurrent awaits, not
  one per row);
- a doc is a duplicate iff any of its bands was already present with a
  matching band hash (banding threshold semantics identical to
  ``minhash_dup_pairs``'s candidate rule).

Ordering caveat (documented, inherent to streaming dedup): which copy of a
duplicate pair survives depends on batch arrival order. Within one batch,
ties resolve to the smallest doc_id (deterministic); across batches the
earlier batch wins. Run with ``preserve_order`` if strict
first-in-stream-wins is required.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..functions.dedup import minhash_band_rows


@ray.remote
class BandIndexActor:
    """Owns a shard of the (band, band_hash) -> first doc_id index."""

    def __init__(self):
        self.index: dict[tuple[int, int], int] = {}

    def check_and_add(
        self, bands: list[int], hashes: list[int], doc_ids: list[int]
    ) -> list[int]:
        """For each row: returns the first-seen doc_id for that bucket
        (inserting the row's doc when the bucket is new). Caller marks a
        doc duplicate iff any returned owner != the doc itself."""
        out = []
        for b, h, d in zip(bands, hashes, doc_ids):
            key = (b, h)
            owner = self.index.setdefault(key, d)
            out.append(owner)
        return out

    def size(self) -> int:
        return len(self.index)


class StreamingDedup:
    """Callable-class Dataset stage bound to a shared actor-pool index.

    Usage:
        sd = StreamingDedup.create(n_shards=4)
        out = ds.map_batches(sd, batch_format="pyarrow", batch_size=512)
        # (plain tasks carrying shared actor handles)
        # out rows: (doc_id, is_duplicate)
    The same StreamingDedup instance can be used across multiple datasets
    (a stream of arriving corpora) — the index persists in the actors.
    """

    def __init__(self, actor_handles: list):
        self.actors = actor_handles

    @classmethod
    def create(cls, n_shards: int = 4) -> "StreamingDedup":
        return cls([BandIndexActor.remote() for _ in range(n_shards)])

    def __call__(self, batch: pa.Table) -> pa.Table:
        band_tbl = minhash_band_rows(batch)
        bands = band_tbl.column("band").to_numpy().astype(np.int64)
        hashes = band_tbl.column("band_hash").to_numpy()
        docs = band_tbl.column("doc_id").to_numpy()
        # within-batch determinism: process rows in (doc_id, band) order so
        # the smallest doc_id claims each new bucket
        order = np.lexsort((bands, docs))
        bands, hashes, docs = bands[order], hashes[order], docs[order]
        k = len(self.actors)
        futures = {}
        parts = {}
        for a in range(k):
            m = (bands % k) == a
            if m.any():
                parts[a] = m
                futures[a] = self.actors[a].check_and_add.remote(
                    bands[m].tolist(), hashes[m].tolist(), docs[m].tolist()
                )
        owner = np.array(docs)  # default: own bucket
        for a, fut in futures.items():
            owner[parts[a]] = ray.get(fut)
        dup_docs = set(docs[owner != docs].tolist())
        doc_ids = batch.column("doc_id").to_pylist()
        return pa.Table.from_pydict(
            {
                "doc_id": doc_ids,
                "is_duplicate": [int(d) in dup_docs for d in doc_ids],
            }
        )

    def index_size(self) -> int:
        return sum(ray.get([a.size.remote() for a in self.actors]))


def streaming_dedup(ds: rd.Dataset, sd: StreamingDedup | None = None) -> rd.Dataset:
    sd = sd or StreamingDedup.create()
    return ds.select_columns(["doc_id", "text"]).map_batches(
        sd, batch_format="pyarrow", batch_size=512
    )
