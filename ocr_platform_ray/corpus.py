"""Deterministic synthetic interleaved-document corpora (FIXTURES.md F1).

Two generators, both pure functions of their seeds (splitmix64, no numpy
RNG), shared by tests, the oracle, the pipeline and bench:

- ``generate_docs``: standalone heavy-tailed corpus for conformance/skew
  tests (80% docs 1-8 spans, 15% 9-40, 5% 41-256; ~30% image spans; image
  geometries chosen to hit single-line, paragraph/strip and resize paths).
- ``spans_from_document``: derives an interleaved span row from a driver
  testdata ``documents`` row (doc_id, text) — used to build the bench corpus
  from /root/testdata without synthesizing external data.
"""

from __future__ import annotations

import pyarrow as pa

from . import media
from .rng import Rng, hash_str, mix64
from .schema import DOCUMENTS_SCHEMA

TEXT_VOCAB = (
    "the quick brown fox jumps over lazy dog data pipeline stream batch "
    "arrow ray span table merge sort shard actor glyph strip block line"
).split()

BOILER = "[[AD]] BUY NOW limited offer [[/AD]]"

# (w, h, n_lines) profiles; mix of single-line, multi-line, paragraph-tall
# (detector emits >56px bands as one box -> strip mode) and one >1200 resize case.
_IMG_PROFILES = [
    (200, 30, 1),
    (320, 40, 1),
    (260, 60, 2),
    (400, 90, 2),
    (350, 120, 3),
    (500, 150, 4),
    (300, 24, 1),
    (450, 200, 5),
    (240, 80, 2),
    (600, 100, 3),
]
_RARE_PROFILES = [
    (160, 16, 0),      # blank image -> zero boxes
    (1500, 300, 4),    # wider than max_side=1200 -> preprocess resize path
    (220, 500, 12),    # tall many-line
]


def _text_span(rng: Rng) -> str:
    n = rng.randint(3, 18)
    words = [rng.choice(TEXT_VOCAB) for _ in range(n)]
    s = " ".join(words)
    r = rng.random()
    if r < 0.15:
        s = "  " + s + "\t "        # whitespace noise -> normalize observable
    if r > 0.85:
        k = rng.randint(0, len(words))
        s = " ".join(words[:k]) + " " + BOILER + " " + " ".join(words[k:])
    if rng.random() < 0.03:
        s = "   "                    # whitespace-only span -> dropped by normalize
    return s


def _image_ref(doc_seed: int, span_idx: int, rng: Rng) -> str:
    prof = (
        rng.choice(_RARE_PROFILES) if rng.random() < 0.06 else rng.choice(_IMG_PROFILES)
    )
    w, h, n_lines = prof
    return media.make_ref(doc_seed, span_idx, w, h, n_lines)


def _make_spans(doc_seed: int, n_spans: int, image_frac: float, rng: Rng) -> list[dict]:
    spans: list[dict] = []
    offset = 0
    for i in range(n_spans):
        if rng.random() < image_frac:
            ref = _image_ref(doc_seed, i, rng)
            spans.append({"kind": "image", "text": "", "media_ref": ref, "offset": offset})
            offset += 1
        else:
            t = _text_span(rng)
            spans.append({"kind": "text", "text": t, "media_ref": "", "offset": offset})
            offset += len(t) + 1
    return spans


def generate_docs(n_docs: int, seed: int = 42) -> list[dict]:
    """Heavy-tailed corpus rows [{doc_id, spans}] (FIXTURES.md F1 profile)."""
    docs: list[dict] = []
    for d in range(n_docs):
        doc_seed = mix64(seed * 2_654_435_761 + d)
        rng = Rng(doc_seed)
        r = rng.random()
        if r < 0.80:
            n_spans = rng.randint(1, 8)
        elif r < 0.95:
            n_spans = rng.randint(9, 40)
        else:
            n_spans = rng.randint(41, 256)
        # degenerate rows (FIXTURES F1): zero spans / all-text / all-image
        image_frac = 0.30
        if d % 97 == 3:
            n_spans = 0
        elif d % 97 == 17:
            image_frac = 0.0
        elif d % 97 == 31:
            image_frac = 1.0
        spans = _make_spans(doc_seed, n_spans, image_frac, rng)
        if d % 97 == 45:
            # dead-letter fixture: malformed media_ref (FIXTURES F1 degenerate)
            spans.append(
                {"kind": "image", "text": "", "media_ref": "img://malformed",
                 "offset": (spans[-1]["offset"] + 1) if spans else 0}
            )
        docs.append({"doc_id": f"doc-{d:08d}", "spans": spans})
    return docs


def docs_to_table(docs: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(docs, schema=DOCUMENTS_SCHEMA)


def generate_corpus_table(n_docs: int, seed: int = 42) -> pa.Table:
    return docs_to_table(generate_docs(n_docs, seed))


def spans_from_document(doc_id: int, text: str) -> list[dict]:
    """Interleaved spans derived deterministically from a testdata
    ``documents`` row: the text is chopped into word chunks; image spans
    (heavy-tailed count, seeded by doc_id) are interleaved between chunks."""
    rng = Rng(mix64(doc_id * 1_000_003 + hash_str(text[:32])))
    words = text.split()
    spans: list[dict] = []
    offset = 0
    r = rng.random()
    if r < 0.80:
        n_img = rng.randint(0, 2)
    elif r < 0.95:
        n_img = rng.randint(3, 8)
    else:
        n_img = rng.randint(9, 40)
    # chunk positions for image insertion
    i = 0
    img_emitted = 0
    while i < len(words) or img_emitted < n_img:
        if i < len(words):
            k = min(len(words) - i, rng.randint(4, 16))
            t = " ".join(words[i : i + k])
            i += k
            spans.append({"kind": "text", "text": t, "media_ref": "", "offset": offset})
            offset += len(t) + 1
        if img_emitted < n_img and (i >= len(words) or rng.random() < 0.5):
            ref = _image_ref(mix64(doc_id), len(spans), rng)
            spans.append({"kind": "image", "text": "", "media_ref": ref, "offset": offset})
            offset += 1
            img_emitted += 1
    return spans


def generate_overrides(docs: list[dict], seed: int = 7) -> list[dict]:
    """Override rows (FIXTURES.md F2) for ~2% of image spans: replacement
    boxes in array order (the human-edit contract), including tall boxes
    exercising original-height strip mode (heights 57, 88)."""
    out: list[dict] = []
    rng = Rng(mix64(seed))
    for doc in docs:
        for idx, sp in enumerate(doc["spans"]):
            if sp["kind"] != "image" or rng.random() > 0.02:
                continue
            try:
                _s, _i, w, h, _n = media.parse_ref(sp["media_ref"])
            except ValueError:
                continue  # dead-letter fixture rows carry malformed refs
            boxes = [
                {"x1": 0, "y1": 0, "x2": max(2, w // 2), "y2": min(h, 57)},
                {"x1": 1, "y1": 1, "x2": max(3, w - 1), "y2": min(h, 88)},
            ]
            out.append({"doc_id": doc["doc_id"], "span_idx": idx, "boxes": boxes})
    return out
