"""Corpus sources beyond Parquet/Lance: JSONL ingestion with schema
enforcement (SURVEY §2.2 P16 — malformed rows are dropped and counted
rather than failing the read; the reference marks such jobs FAILED,
ocr_tasks.py:204-212).

Interleaved-doc JSONL row shape:
    {"doc_id": "...", "spans": [{"kind": "text", "text": "...",
     "media_ref": "", "offset": 0}, ...]}
"""

from __future__ import annotations

import json

import pyarrow as pa

import ray.data as rd

from .schema import DOCUMENTS_SCHEMA


def _coerce_row(obj: dict) -> dict | None:
    """Validate + coerce one parsed JSON object to the documents schema;
    None for structurally malformed rows (dead-letter)."""
    try:
        doc_id = obj["doc_id"]
        if not isinstance(doc_id, str):
            return None
        spans = []
        for sp in obj.get("spans") or []:
            kind = sp.get("kind")
            if kind not in ("text", "image"):
                return None
            spans.append(
                {
                    "kind": kind,
                    "text": str(sp.get("text") or ""),
                    "media_ref": str(sp.get("media_ref") or ""),
                    "offset": int(sp.get("offset", 0)),
                }
            )
        return {"doc_id": doc_id, "spans": spans}
    except (KeyError, TypeError, ValueError):
        return None


def read_corpus_jsonl(path: str) -> rd.Dataset:
    """Read an interleaved-document corpus from JSONL file(s).

    Uses read_text + per-batch json parsing (read_json cannot enforce the
    nested span struct against heterogeneous rows); malformed lines/rows
    are dropped (schema-enforcement-at-read, dead-letter semantics)."""

    def parse(batch: pa.Table) -> pa.Table:
        rows = []
        for line in batch.column("text").to_pylist():
            line = line.strip()
            if not line:
                continue
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            row = _coerce_row(obj)
            if row is not None:
                rows.append(row)
        return pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA)

    return rd.read_text(path).map_batches(parse, batch_format="pyarrow")


def write_corpus_jsonl(docs: list[dict], path: str) -> None:
    """Write corpus rows as JSONL (test/interchange helper)."""
    with open(path, "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")
