"""Stateful actor stages: detect, recognize, fused extract.

Mirrors the reference's per-process model singletons (``@lru_cache``
detector/recognizer — /root/reference/libs/ocr_core/ocr_core/pipeline/
detect.py:68-82, engines/vietocr_engine.py:47-53): state (config, glyph
templates, broadcast override table) is built once per actor in
``__init__``; ``__call__`` processes an Arrow batch of document rows.
Deploy with ``ds.map_batches(Cls, concurrency=N, batch_size=B)``; in a GPU
deployment these stages take ``num_gpus`` (the sandbox is CPU-only — the
knob is plumbed through PipelineOptions).

Per batch, the heavy work (render/detect/decode) is numpy-vectorized per
image; row iteration is only orchestration. Overrides are the human-edit
analogue (PATCH /jobs/{id}/detect): a small table broadcast once via
``ray.put`` and resolved in ``__init__`` — never re-shipped per batch.
"""

from __future__ import annotations

import pyarrow as pa

from .. import font  # noqa: F401  (imported so templates build at actor init)
from ..kernels import recognizek
from ..kernels.extract import (
    ExtractConfig,
    detect_image,
    finish_recognize,
    prepare_image_span,
    prepare_recognize,
    safe_extract_image_span,  # noqa: F401  (re-exported; oracle/test surface)
)
from ..schema import BOX_STRUCT, EXTRACTED_SCHEMA, SPAN_STRUCT

DETECT_ENTRY = pa.struct(
    [
        pa.field("span_idx", pa.int32()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("boxes", pa.list_(BOX_STRUCT)),
    ]
)


# Input columns the extract stages consume; anything else (e.g. tenant_id,
# provenance tags) is forwarded to the output untouched, in input row order.
_CONSUMED_COLS = {"spans", "n_spans", "n_image_spans", "detect", "n_detect_errors"}

_MISSING = object()  # sentinel: span had no prepared entry at all


def _with_passthrough(out: pa.Table, batch: pa.Table) -> pa.Table:
    """Forward non-consumed input columns (tenant scoping / metadata) onto
    the stage output — valid because stages emit exactly one output row per
    input row, in order."""
    for name in batch.column_names:
        if name in _CONSUMED_COLS or name in out.column_names:
            continue
        out = out.append_column(name, batch.column(name))
    return out


def _resolve(obj):
    """Resolve a broadcast ObjectRef (or pass through a plain value)."""
    import ray

    if isinstance(obj, ray.ObjectRef):
        return ray.get(obj)
    return obj


def overrides_to_lookup(rows: list[dict]) -> dict[tuple[str, int], list[tuple]]:
    """Override table rows -> {(doc_id, span_idx): [(x1,y1,x2,y2), ...]}."""
    out: dict[tuple[str, int], list[tuple]] = {}
    for r in rows or []:
        out[(r["doc_id"], int(r["span_idx"]))] = [
            (int(b["x1"]), int(b["y1"]), int(b["x2"]), int(b["y2"])) for b in r["boxes"]
        ]
    return out


class DetectStage:
    """Doc rows -> doc rows + ``detect`` column (one entry per image span,
    boxes in original page coordinates, reading order). The embedded-row
    analogue of the reference's detect_result TEXT column (DETECT_DONE)."""

    def __init__(self, cfg: ExtractConfig | None = None):
        self.cfg = cfg or ExtractConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans_col = batch.column("spans").to_pylist()
        detect_col = []
        err_col = []
        for spans in spans_col:
            entries = []
            n_err = 0
            for i, sp in enumerate(spans or []):
                if sp["kind"] != "image":
                    continue
                try:
                    boxes, w, h = detect_image(sp["media_ref"], self.cfg)
                except (ValueError, KeyError, IndexError, OverflowError):
                    # dead-letter: malformed media_ref -> no detect entry ->
                    # recognize emits nothing for this span; counted so the
                    # shard manifest surfaces it
                    n_err += 1
                    continue
                entries.append(
                    {
                        "span_idx": i,
                        "width": w,
                        "height": h,
                        "boxes": [
                            {"x1": b[0], "y1": b[1], "x2": b[2], "y2": b[3]}
                            for b in boxes
                        ],
                    }
                )
            detect_col.append(entries)
            err_col.append(n_err)
        out = batch
        for name in ("detect", "n_detect_errors"):
            if name in out.column_names:
                out = out.drop_columns([name])
        out = out.append_column(
            "detect", pa.array(detect_col, type=pa.list_(DETECT_ENTRY))
        )
        return out.append_column("n_detect_errors", pa.array(err_col, pa.int32()))


class RecognizeStage:
    """Doc rows with ``detect`` column -> extracted span sequences.

    Applies overrides (broadcast), recognizes each image span's boxes with
    the exact reference arithmetic, drops empty normalized text spans, and
    merges everything back in offset order — all row-local (no shuffle:
    every span of a doc lives in its row)."""

    def __init__(self, cfg: ExtractConfig | None = None, overrides_ref=None):
        self.cfg = cfg or ExtractConfig()
        self.overrides = overrides_to_lookup(_resolve(overrides_ref))

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        spans_col = batch.column("spans").to_pylist()
        detect_col = batch.column("detect").to_pylist()
        det_errs = (
            batch.column("n_detect_errors").to_pylist()
            if "n_detect_errors" in batch.column_names
            else [0] * batch.num_rows
        )
        # Phase 1 (per image span): render + preprocess + crop + strip-split.
        # Strips from the WHOLE batch are decoded in ONE vectorized
        # template-matching pass below — per-strip decoding is independent,
        # so this is exactly equivalent to per-image decode (profiling: the
        # per-image decode dispatch, not the pylist boundary, dominated
        # actor wall time).
        all_strips: list = []
        prepared: dict[tuple[int, int], tuple | None] = {}
        for r, (doc_id, spans, detect) in enumerate(
            zip(doc_ids, spans_col, detect_col)
        ):
            det_by_idx = {e["span_idx"]: e for e in (detect or [])}
            for i, sp in enumerate(spans or []):
                if sp["kind"] != "image":
                    continue
                entry = det_by_idx.get(i)
                if entry is None:
                    continue  # dead-lettered at detect (already counted)
                ov = self.overrides.get((doc_id, i))
                if ov is not None:
                    boxes = ov
                else:
                    boxes = [
                        (b["x1"], b["y1"], b["x2"], b["y2"]) for b in entry["boxes"]
                    ]
                try:
                    strips, counts = prepare_recognize(
                        sp["media_ref"], boxes, entry["width"], entry["height"],
                        self.cfg,
                    )
                except (ValueError, KeyError, IndexError, OverflowError):
                    # recognize-phase poison (e.g. an invalid override box):
                    # count it like the fused path's safe_extract wrapper
                    # instead of crashing the shard
                    prepared[(r, i)] = None
                    continue
                prepared[(r, i)] = (boxes, counts, len(all_strips))
                all_strips.extend(strips)
        decoded = recognizek.decode_strips(all_strips)

        rows = []
        for r, (doc_id, spans, base_err) in enumerate(
            zip(doc_ids, spans_col, det_errs)
        ):

            def block_fn(i, sp, _r=r):
                p = prepared.get((_r, i), _MISSING)
                if p is _MISSING:
                    return [], 0  # dead-lettered at detect (already counted)
                if p is None:
                    return [], 1  # recognize-phase poison
                boxes, counts, start = p
                return finish_recognize(
                    boxes, counts, decoded[start : start + sum(counts)], span_idx=i
                ), 0

            rows.append(
                _assemble_row(
                    doc_id, spans or [], self.cfg, block_fn,
                    base_errors=int(base_err or 0),
                )
            )
        return _with_passthrough(
            pa.Table.from_pylist(rows, schema=EXTRACTED_SCHEMA), batch
        )


def _assemble_row(
    doc_id: str,
    spans: list[dict],
    cfg: ExtractConfig,
    block_fn,
    base_errors: int = 0,
):
    """Row-local merge: spans in (offset, index) order; text spans pass
    through (already normalized upstream, empties dropped); image spans are
    replaced by their recognized blocks; output offsets re-numbered.
    ``block_fn(i, span) -> (blocks, err)``; errs accumulate into
    ``n_span_errors`` on top of ``base_errors`` (detect-phase count)."""
    order = sorted(range(len(spans)), key=lambda i: (spans[i]["offset"], i))
    out_spans: list[dict] = []
    n_blocks = 0
    n_errors = base_errors
    min_conf = 1.0
    conf_sum = 0.0
    for i in order:
        sp = spans[i]
        if sp["kind"] == "text":
            if sp["text"] or not cfg.drop_empty_text_spans:
                out_spans.append(
                    {"kind": "text", "text": sp["text"], "media_ref": "",
                     "offset": len(out_spans)}
                )
        elif sp["kind"] == "image":
            blocks, err = block_fn(i, sp)
            n_errors += err
            for b in blocks:
                out_spans.append(
                    {"kind": "image", "text": b.text,
                     "media_ref": sp["media_ref"], "offset": len(out_spans)}
                )
                n_blocks += 1
                min_conf = min(min_conf, b.conf)
                conf_sum += b.conf
    return {
        "doc_id": doc_id,
        "spans_out": out_spans,
        "n_spans_out": len(out_spans),
        "n_blocks": n_blocks,
        "min_conf": min_conf,
        "mean_conf": (conf_sum / n_blocks) if n_blocks else 1.0,
        "n_span_errors": n_errors,
    }


class ExtractStage:
    """Fused detect+recognize (reference ``run_ocr`` analogue): one actor
    stage, no intermediate detect materialization, each raster decoded once
    and shared by both kernels. Produces exactly what DetectStage ->
    RecognizeStage produces (same kernels, deterministic)."""

    def __init__(self, cfg: ExtractConfig | None = None, overrides_ref=None):
        self.cfg = cfg or ExtractConfig()
        self.overrides = overrides_to_lookup(_resolve(overrides_ref))

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        spans_col = batch.column("spans").to_pylist()
        # Phase 1 (per image span): render once, detect (or override),
        # preprocess/crop/strip-split; ONE batch-wide decode pass below
        # (see RecognizeStage.__call__ for the rationale).
        all_strips: list = []
        prepared: dict[tuple[int, int], tuple | None] = {}
        for r, (doc_id, spans) in enumerate(zip(doc_ids, spans_col)):
            for i, sp in enumerate(spans or []):
                if sp["kind"] != "image":
                    continue
                try:
                    boxes, counts, strips = prepare_image_span(
                        sp["media_ref"], self.cfg,
                        override_boxes=self.overrides.get((doc_id, i)),
                    )
                except (ValueError, KeyError, IndexError, OverflowError):
                    prepared[(r, i)] = None  # dead-letter: counted below
                    continue
                prepared[(r, i)] = (boxes, counts, len(all_strips))
                all_strips.extend(strips)
        decoded = recognizek.decode_strips(all_strips)

        rows = []
        for r, (doc_id, spans) in enumerate(zip(doc_ids, spans_col)):

            def block_fn(i, sp, _r=r):
                p = prepared.get((_r, i))
                if p is None:
                    return [], 1
                boxes, counts, start = p
                return finish_recognize(
                    boxes, counts, decoded[start : start + sum(counts)], span_idx=i
                ), 0

            rows.append(_assemble_row(doc_id, spans or [], self.cfg, block_fn))
        return _with_passthrough(
            pa.Table.from_pylist(rows, schema=EXTRACTED_SCHEMA), batch
        )


def detect_rows_view(batch: pa.Table) -> pa.Table:
    """Flatten the embedded ``detect`` column to the span-level DETECT
    table (schema.DETECT_SCHEMA) for inspection / SQL-style checks."""
    doc_ids = batch.column("doc_id").to_pylist()
    spans_col = batch.column("spans").to_pylist()
    detect_col = batch.column("detect").to_pylist()
    rows = []
    for doc_id, spans, detect in zip(doc_ids, spans_col, detect_col):
        for e in detect or []:
            rows.append(
                {
                    "doc_id": doc_id,
                    "span_idx": e["span_idx"],
                    "media_ref": spans[e["span_idx"]]["media_ref"],
                    "width": e["width"],
                    "height": e["height"],
                    "boxes": e["boxes"],
                }
            )
    from ..schema import DETECT_SCHEMA

    return pa.Table.from_pylist(rows, schema=DETECT_SCHEMA)
