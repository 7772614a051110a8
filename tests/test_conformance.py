"""Conformance: Ray pipeline output == single-process oracle, 100% of rows.

The invariant (BASELINE.json input_hint): per-row span-sequence equality
on (kind, text, media_ref, order). Also: invariance under input
partitioning, the two-phase (checkpointed) path equals the fused path, and
the override table (human-edit analogue) takes effect.
"""

import pyarrow as pa
import pytest

import ray.data as rd

from ocr_platform_ray import corpus, oracle
from ocr_platform_ray.kernels.extract import ExtractConfig
from ocr_platform_ray.pipeline import (
    PipelineOptions,
    build_detect_pipeline,
    build_extract_pipeline,
    build_recognize_pipeline,
)

N_DOCS = 120
SEED = 42


@pytest.fixture(scope="module")
def docs():
    return corpus.generate_docs(N_DOCS, seed=SEED)


@pytest.fixture(scope="module")
def expected(docs):
    return oracle.oracle_extract_docs(docs, ExtractConfig())


def _result_map(ds) -> dict:
    out = {}
    for batch in ds.iter_batches(batch_size=256, batch_format="pyarrow"):
        for row in batch.to_pylist():
            out[row["doc_id"]] = [
                (s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in row["spans_out"]
            ]
    return out


def _assert_equal(got: dict, expected: dict):
    assert set(got) == set(expected)
    bad = [d for d in expected if got[d] != expected[d]]
    assert not bad, f"{len(bad)} mismatching docs, first: {bad[0]}: " \
        f"got={got[bad[0]][:3]} want={expected[bad[0]][:3]}"


def test_fused_pipeline_matches_oracle(docs, expected):
    ds = rd.from_arrow(corpus.docs_to_table(docs))
    out = build_extract_pipeline(ds, opts=PipelineOptions(concurrency=(1, 4)))
    _assert_equal(_result_map(out), expected)


def test_partitioning_invariance(docs, expected):
    """Output must not depend on block layout (SURVEY §7.5.1)."""
    tbl = corpus.docs_to_table(docs)
    ds = rd.from_arrow(tbl).repartition(13)
    out = build_extract_pipeline(ds, opts=PipelineOptions(concurrency=(1, 2)))
    _assert_equal(_result_map(out), expected)


def test_two_phase_equals_fused(docs, expected, tmp_path):
    """Detect checkpoint -> recognize == fused (the reference's DETECT_DONE
    two-phase resume property)."""
    ds = rd.from_arrow(corpus.docs_to_table(docs))
    opts = PipelineOptions(concurrency=(1, 4))
    detected = build_detect_pipeline(ds, opts=opts)
    ckpt = str(tmp_path / "detect_ckpt")
    detected.write_parquet(ckpt)
    detected2 = rd.read_parquet(ckpt)
    out = build_recognize_pipeline(detected2, opts=opts)
    _assert_equal(_result_map(out), expected)


def test_overrides_applied(docs):
    """Override boxes replace detected boxes for their (doc, span)."""
    ov = corpus.generate_overrides(docs, seed=7)
    assert ov, "corpus should yield at least one override row"
    expected_ov = oracle.oracle_extract_docs(docs, ExtractConfig(), overrides=ov)
    ds = rd.from_arrow(corpus.docs_to_table(docs))
    out = build_extract_pipeline(
        ds, opts=PipelineOptions(concurrency=(1, 2)), overrides=ov
    )
    got = _result_map(out)
    _assert_equal(got, expected_ov)
    # and the override must actually change at least one document
    base = oracle.oracle_extract_docs(docs, ExtractConfig())
    assert any(expected_ov[d] != base[d] for d in base)


def test_result_overrides_applied(docs):
    """Result-override table (PATCH /jobs/{id}/result analogue) replaces a
    doc's whole extracted span sequence at merge; untouched docs unchanged."""
    from ocr_platform_ray.pipeline import apply_result_overrides

    ds = rd.from_arrow(corpus.docs_to_table(docs))
    base = build_extract_pipeline(ds, opts=PipelineOptions(concurrency=(1, 2)))
    target = docs[0]["doc_id"]
    replacement = [
        {"kind": "text", "text": "HUMAN EDITED", "media_ref": "", "offset": 0},
        {"kind": "image", "text": "FIXED BLOCK", "media_ref": "m", "offset": 1},
    ]
    out = apply_result_overrides(
        base, [{"doc_id": target, "spans_out": replacement}]
    )
    rows = {r["doc_id"]: r for r in out.take_all()}
    got = rows[target]
    assert [
        (s["kind"], s["text"], s["media_ref"], s["offset"])
        for s in got["spans_out"]
    ] == [("text", "HUMAN EDITED", "", 0), ("image", "FIXED BLOCK", "m", 1)]
    assert got["n_spans_out"] == 2 and got["n_blocks"] == 1
    assert got["min_conf"] == 1.0 and got["mean_conf"] == 1.0
    # other docs keep the pipeline output
    expected = oracle.oracle_extract_docs(docs, ExtractConfig())
    for d, spans in expected.items():
        if d == target:
            continue
        assert [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in rows[d]["spans_out"]
        ] == spans


def test_schema(docs):
    ds = rd.from_arrow(corpus.docs_to_table(docs))
    out = build_extract_pipeline(ds, opts=PipelineOptions(concurrency=(1, 2)))
    schema = out.schema()
    assert schema.names == [
        "doc_id", "spans_out", "n_spans_out", "n_blocks",
        "min_conf", "mean_conf", "n_span_errors",
    ]
    batch = next(iter(out.iter_batches(batch_size=8, batch_format="pyarrow")))
    assert isinstance(batch, pa.Table)


def test_malformed_media_ref_dead_letter():
    """A span whose media_ref cannot be parsed contributes nothing, the
    rest of the document extracts normally (P16 dead-letter semantics)."""
    docs = [
        {
            "doc_id": "doc-x",
            "spans": [
                {"kind": "text", "text": " hello world ", "media_ref": "", "offset": 0},
                {"kind": "image", "text": "", "media_ref": "img://not-a-ref", "offset": 14},
                {"kind": "text", "text": "tail", "media_ref": "", "offset": 15},
            ],
        }
    ]
    expected = oracle.oracle_extract_docs(docs, ExtractConfig())
    assert expected["doc-x"] == [
        ("text", "hello world", "", 0),
        ("text", "tail", "", 1),
    ]
    ds = rd.from_arrow(corpus.docs_to_table(docs))
    out = build_extract_pipeline(ds, opts=PipelineOptions(concurrency=(1, 2)))
    rows = out.take_all()
    _assert_equal(_result_map(out), expected)
    # the poison span is counted, not just dropped (manifest surfacing)
    assert [r["n_span_errors"] for r in rows] == [1]


def test_recognize_phase_poison_counted_not_fatal():
    """A recognize-phase failure (detect entry present but media
    unrenderable at recognize time) is dead-lettered like the fused path,
    not a shard-killing exception."""
    import pyarrow as pa

    from ocr_platform_ray.stages.extract import RecognizeStage

    batch = pa.Table.from_pylist([
        {
            "doc_id": "d0",
            "spans": [
                {"kind": "text", "text": "ok", "media_ref": "", "offset": 0},
                {"kind": "image", "text": "", "media_ref": "img://gone", "offset": 3},
            ],
            "detect": [
                {"span_idx": 1, "width": 100, "height": 30,
                 "boxes": [{"x1": 0, "y1": 0, "x2": 50, "y2": 20}]},
            ],
            "n_detect_errors": 0,
        }
    ])
    out = RecognizeStage()(batch).to_pylist()
    assert len(out) == 1
    assert out[0]["n_span_errors"] == 1
    assert [s["kind"] for s in out[0]["spans_out"]] == ["text"]
