"""Arrow schemas for the engine's tables (pydantic-model analogue).

Reference data model: /root/reference/libs/ocr_core/ocr_core/domain/
models.py (OcrBlock/OcrPage/OcrResult) and the detect_result JSON contract
(apps/worker/app/tasks/ocr_tasks.py:110-124). Here everything is typed
Arrow instead of JSON-in-TEXT.
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)

# Input table (BASELINE.json input_hint).
DOCUMENTS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# Multi-tenant corpus variant: the reference scopes every operation by
# tenant (MinIO keys ``inputs/{tenant}/...``, job rows filtered by
# tenant_id — /root/reference/apps/api/app/api/v1/routes_jobs.py:52-63).
# Here tenant is a data-model column: present on the corpus, passed
# through extraction untouched (stages forward unknown columns), counted
# per shard in the manifest, and filterable with ``pipeline.scope_tenant``.
DOCUMENTS_TENANT_SCHEMA = DOCUMENTS_SCHEMA.append(
    pa.field("tenant_id", pa.string())
)

# Output table: extracted ordered span sequence + row-local metrics.
EXTRACTED_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans_out", pa.list_(SPAN_STRUCT)),
        pa.field("n_spans_out", pa.int32()),
        pa.field("n_blocks", pa.int32()),       # recognized image blocks
        pa.field("min_conf", pa.float64()),
        pa.field("mean_conf", pa.float64()),   # A2 analogue (orchestrator.py:96-99)
        # dead-letter count: image spans whose media could not be parsed /
        # rendered (reference: malformed detect_result -> job FAILED,
        # ocr_tasks.py:204-212; here the poison span contributes 0 blocks
        # and is counted, surfacing in the shard manifest)
        pa.field("n_span_errors", pa.int32()),
    ]
)

BOX_STRUCT = pa.struct(
    [
        pa.field("x1", pa.int32()),
        pa.field("y1", pa.int32()),
        pa.field("x2", pa.int32()),
        pa.field("y2", pa.int32()),
    ]
)

# Detect-stage checkpoint (the reference's DETECT_DONE boundary:
# detect_result TEXT column + results/{...}/detect.json).
DETECT_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("span_idx", pa.int32()),
        pa.field("media_ref", pa.string()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("boxes", pa.list_(BOX_STRUCT)),
    ]
)

# Override table (human-edit analogue, PATCH /jobs/{id}/detect).
OVERRIDES_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("span_idx", pa.int32()),
        pa.field("boxes", pa.list_(BOX_STRUCT)),
    ]
)

# Result-override table (human-edit analogue of PATCH /jobs/{id}/result,
# routes_jobs.py:252-270: the whole result JSON is replaced per job). The
# batch analogue: per-doc replacement span sequences, applied at merge.
RESULT_OVERRIDES_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans_out", pa.list_(SPAN_STRUCT)),
    ]
)
