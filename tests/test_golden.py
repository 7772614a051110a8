"""Golden-output stability (FIXTURES.md F3): the committed expected_spans
parquet pins the oracle's semantics across build rounds — any change to
kernel arithmetic, the renderer, the font or the corpus generator that
alters extraction output fails here LOUDLY instead of silently shifting
both oracle and pipeline together (the conformance suite alone cannot see
such drift, since both sides share the kernels)."""

import pyarrow.parquet as pq

from ocr_platform_ray import corpus, oracle
from ocr_platform_ray.kernels.extract import ExtractConfig

GOLDEN = "tests/goldens/expected_spans_300.parquet"


def test_oracle_matches_committed_golden():
    docs = corpus.generate_docs(300, seed=42)
    got = oracle.oracle_extract_docs(docs, ExtractConfig())
    want = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans_out"]
        ]
        for r in pq.read_table(GOLDEN).to_pylist()
    }
    assert set(got) == set(want)
    bad = [d for d in want if got[d] != want[d]]
    assert not bad, (
        f"{len(bad)} docs drifted from the committed golden "
        f"(first: {bad[0]}) — if the semantics change was intentional, "
        f"regenerate tests/goldens/ and say so in the commit message"
    )
