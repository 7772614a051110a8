"""Shared-mutable-index streaming dedup (state/dedup_index.py): duplicates
are caught across separately-executed datasets — state the Dataset API
cannot carry between runs."""

import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.state.dedup_index import StreamingDedup, streaming_dedup

BASE = (
    "the quick brown fox jumps over the lazy dog while data pipelines "
    "stream batches of arrow tables through ray actors and shuffles"
)


def _ds(rows):
    return rd.from_arrow(pa.Table.from_pylist(rows))


def test_within_batch_duplicate_flagged():
    rows = [
        {"doc_id": 1, "text": BASE},
        {"doc_id": 2, "text": BASE},
        {"doc_id": 3, "text": "something entirely different with many unique words here"},
    ]
    out = streaming_dedup(_ds(rows)).to_pandas().set_index("doc_id")
    assert not out.loc[1, "is_duplicate"]      # smallest doc claims buckets
    assert out.loc[2, "is_duplicate"]
    assert not out.loc[3, "is_duplicate"]


def test_cross_stream_duplicate_flagged():
    sd = StreamingDedup.create(n_shards=3)
    first = [{"doc_id": 10, "text": BASE}]
    second = [
        {"doc_id": 20, "text": BASE},                       # dup of stream 1
        {"doc_id": 21, "text": "fresh new content " * 8},
    ]
    out1 = streaming_dedup(_ds(first), sd).to_pandas()
    assert not out1["is_duplicate"].any()
    out2 = streaming_dedup(_ds(second), sd).to_pandas().set_index("doc_id")
    assert out2.loc[20, "is_duplicate"]         # remembered across datasets
    assert not out2.loc[21, "is_duplicate"]
    assert sd.index_size() > 0
