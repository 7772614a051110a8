"""Recognition kernels: crop clamping, tall-crop strip arithmetic, glyph decode.

Replicates, exactly, the reference's conformance-critical arithmetic:

- crop clamps (/root/reference/libs/ocr_core/ocr_core/pipeline/recognize.py:9-13):
  ``x1 = max(0, x1); y1 = max(0, y1); x2 = max(x1 + 1, x2); y2 = max(y1 + 1, y2)``
  with PIL-style zero padding when a crop extends past the image.
- strip splitting (/root/reference/libs/ocr_core/ocr_core/engines/
  vietocr_engine.py:14-16,63-100): MAX_SINGLE_LINE_HEIGHT=56,
  LINE_STRIP_HEIGHT=32, LINE_STRIP_OVERLAP=4, min strip 8 px; two modes —
  original-height mode (box height in page coords > 56: ``num_strips =
  max(1, round(oh / 32))``, step 28 in page coords, last strip extended to
  the bottom, page->crop mapping ``int(y * h / oh)``) and crop-height mode
  (walk y by 28, strip [y, min(y+32, h)]).
- multi-strip join (vietocr_engine.py:103-127): texts joined with "\\n",
  conf = min of strip probs; single-strip: predict on the FULL crop.
- postprocess (/root/reference/libs/ocr_core/ocr_core/pipeline/
  postprocess.py:4-6): whitespace strip only.

The VietOCR network itself is replaced by the deterministic glyph-template
decoder in ``font.decode_band`` (dominant ink band per strip).
"""

from __future__ import annotations

import numpy as np

from .. import font

MAX_SINGLE_LINE_HEIGHT = 56
LINE_STRIP_HEIGHT = 32
LINE_STRIP_OVERLAP = 4
MIN_STRIP_PX = 8

Box = tuple[int, int, int, int]


def clamp_box(box: Box) -> Box:
    """Reference ``_crop`` clamp (recognize.py:9-13)."""
    x1, y1, x2, y2 = box
    x1 = max(0, x1)
    y1 = max(0, y1)
    x2 = max(x1 + 1, x2)
    y2 = max(y1 + 1, y2)
    return x1, y1, x2, y2


def crop(img: np.ndarray, box: Box) -> np.ndarray:
    """Clamped crop with PIL-style zero padding beyond image bounds."""
    x1, y1, x2, y2 = clamp_box(box)
    out = np.zeros((y2 - y1, x2 - x1), dtype=img.dtype)
    h, w = img.shape[:2]
    sy1, sy2 = min(y1, h), min(y2, h)
    sx1, sx2 = min(x1, w), min(x2, w)
    if sy2 > sy1 and sx2 > sx1:
        out[: sy2 - sy1, : sx2 - sx1] = img[sy1:sy2, sx1:sx2]
    return out


def strip_bounds(crop_h: int, original_height_px: int | None) -> list[tuple[int, int]]:
    """Crop-coordinate strip [y1, y2) bounds per the reference's exact
    arithmetic (vietocr_engine.py:63-100). Empty result means "use the full
    crop as a single strip" (the reference's ``strips if strips else [img]``).
    """
    h = crop_h
    use_original = (
        original_height_px is not None and original_height_px > MAX_SINGLE_LINE_HEIGHT
    )
    if use_original:
        oh = original_height_px
        num_strips = max(1, round(oh / LINE_STRIP_HEIGHT))  # Python banker's round
        step_orig = max(1, LINE_STRIP_HEIGHT - LINE_STRIP_OVERLAP)
        strips: list[tuple[int, int]] = []
        for i in range(num_strips):
            y_orig = i * step_orig
            y2_orig = oh if i == num_strips - 1 else min(y_orig + LINE_STRIP_HEIGHT, oh)
            y1_crop = int(y_orig * h / oh)
            y2_crop = int(y2_orig * h / oh)
            if y2_crop > y1_crop and (y2_crop - y1_crop) >= MIN_STRIP_PX:
                strips.append((y1_crop, y2_crop))
        return strips
    if h <= MAX_SINGLE_LINE_HEIGHT:
        return [(0, h)]
    step = max(1, LINE_STRIP_HEIGHT - LINE_STRIP_OVERLAP)
    strips = []
    y = 0
    while y < h:
        y2 = min(y + LINE_STRIP_HEIGHT, h)
        if y2 - y >= MIN_STRIP_PX:
            strips.append((y, y2))
        y += step
    return strips


def strip_band(strip: np.ndarray) -> "np.ndarray | None":
    """Dominant ink band of a strip (tallest, ties topmost) as a binarized
    slice; None for a blank strip. Binarizes only the winning band's rows
    (row-ink via a per-row max reduction, not a full-strip bool)."""
    row_any = strip.max(axis=1) > 127
    if not row_any.any():
        return None
    idx = np.flatnonzero(np.diff(np.concatenate(([0], row_any.view(np.int8), [0]))))
    bands = [(int(idx[i]), int(idx[i + 1])) for i in range(0, len(idx), 2)]
    r0, r1 = max(bands, key=lambda b: (b[1] - b[0], -b[0]))
    return strip[r0:r1] > 127


def decode_strip(strip: np.ndarray) -> tuple[str, float]:
    """One strip -> (text, conf): dominant ink band decoded by
    glyph-template match; blank strip -> ("", 1.0)."""
    band = strip_band(strip)
    if band is None:
        return "", 1.0
    return font.decode_band(band)


def _row_ink_by_shape(strips: list[np.ndarray]) -> list[np.ndarray]:
    """Per-strip row-ink bool vectors, the 2D reductions batched: strips
    are grouped by shape, stacked, and reduced in ONE ``max(axis=2)``
    call per group (a handful of distinct strip shapes per batch vs one
    numpy dispatch per strip). Exactly ``strip.max(axis=1) > 127`` each."""
    from collections import defaultdict

    groups: dict[tuple, list[int]] = defaultdict(list)
    for i, s in enumerate(strips):
        groups[s.shape].append(i)
    out: list[np.ndarray] = [None] * len(strips)  # type: ignore[list-item]
    for idxs in groups.values():
        stack = np.stack([strips[i] for i in idxs])
        ink = stack.max(axis=2) > 127
        for j, i in enumerate(idxs):
            out[i] = ink[j]
    return out


def _band_from_row_ink(strip: np.ndarray, row_any: np.ndarray):
    """Dominant band given the strip's precomputed row-ink vector —
    the tail of ``strip_band`` (same selection rule, same binarize)."""
    if not row_any.any():
        return None
    idx = np.flatnonzero(np.diff(np.concatenate(([0], row_any.view(np.int8), [0]))))
    bands = [(int(idx[i]), int(idx[i + 1])) for i in range(0, len(idx), 2)]
    r0, r1 = max(bands, key=lambda b: (b[1] - b[0], -b[0]))
    return strip[r0:r1] > 127


def decode_strips(strips: list[np.ndarray]) -> list[tuple[str, float]]:
    """Batched decode: shape-grouped row-ink reductions, band extraction
    per strip, then ONE vectorized template-matching pass over all bands
    (``font.decode_bands``) — identical results to per-strip
    ``decode_strip``, far fewer tiny numpy dispatches on the hot path."""
    row_ink = _row_ink_by_shape(strips)
    bands = [_band_from_row_ink(s, r) for s, r in zip(strips, row_ink)]
    live = [i for i, b in enumerate(bands) if b is not None]
    decoded = font.decode_bands([bands[i] for i in live])
    out: list[tuple[str, float]] = [("", 1.0)] * len(strips)
    for j, i in enumerate(live):
        out[i] = decoded[j]
    return out


def recognize_crop(crop_img: np.ndarray, original_height_px: int | None) -> tuple[str, float]:
    """Reference ``_predict_one_crop_maybe_multiline`` (vietocr_engine.py:103-127):
    1 strip -> predict on the full crop; N strips -> per-strip predict,
    join with "\\n", conf = min."""
    bounds = strip_bounds(crop_img.shape[0], original_height_px)
    if not bounds:
        bounds = [(0, crop_img.shape[0])]
    if len(bounds) == 1:
        return decode_strip(crop_img)
    texts: list[str] = []
    probs: list[float] = []
    for y1, y2 in bounds:
        t, p = decode_strip(crop_img[y1:y2])
        texts.append(t)
        probs.append(p)
    return "\n".join(texts), (min(probs) if probs else 1.0)


def postprocess_texts(texts: list[str]) -> list[str]:
    """Reference postprocess (postprocess.py:4-6): whitespace strip only."""
    return [t.strip() for t in texts]
