"""Single-process reference-semantics oracle (the conformance spec).

Computes, for a corpus of interleaved documents, the exact output span
sequence the Ray pipeline must produce — plain Python loops over the shared
deterministic kernels, no Ray, no batching. The pytest conformance suite
(SURVEY §5) asserts per-row span-sequence equality (kind, text, media_ref,
order) between this oracle and the pipeline, 100% of rows.
"""

from __future__ import annotations

import pyarrow as pa

from .kernels.extract import ExtractConfig, extract_document
from .schema import SPAN_STRUCT


def oracle_extract_docs(
    docs: list[dict],
    cfg: ExtractConfig | None = None,
    overrides: list[dict] | None = None,
) -> dict[str, list[tuple]]:
    """-> {doc_id: [(kind, text, media_ref, offset), ...]}"""
    cfg = cfg or ExtractConfig()
    ov_by_doc: dict[str, dict[int, list[tuple]]] = {}
    for row in overrides or []:
        boxes = [(b["x1"], b["y1"], b["x2"], b["y2"]) for b in row["boxes"]]
        ov_by_doc.setdefault(row["doc_id"], {})[int(row["span_idx"])] = boxes
    out: dict[str, list[tuple]] = {}
    for doc in docs:
        spans_out = extract_document(
            doc["spans"], cfg, overrides=ov_by_doc.get(doc["doc_id"])
        )
        out[doc["doc_id"]] = [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans_out
        ]
    return out


def oracle_extract_table(
    docs: list[dict],
    cfg: ExtractConfig | None = None,
    overrides: list[dict] | None = None,
) -> pa.Table:
    """Golden-output table (FIXTURES.md F3): (doc_id, spans_out)."""
    res = oracle_extract_docs(docs, cfg, overrides)
    rows = [
        {
            "doc_id": doc_id,
            "spans_out": [
                {"kind": k, "text": t, "media_ref": m, "offset": o}
                for (k, t, m, o) in seq
            ],
        }
        for doc_id, seq in res.items()
    ]
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [pa.field("doc_id", pa.string()), pa.field("spans_out", pa.list_(SPAN_STRUCT))]
        ),
    )
