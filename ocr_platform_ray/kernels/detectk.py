"""Text-region detection: projection-profile box proposals (CRAFT stand-in)
reduced with the reference's exact polygon->box arithmetic.

Reference: /root/reference/libs/ocr_core/ocr_core/pipeline/detect.py:85-119
(``detect_text_boxes``): CRAFT emits float polygons (N, 4, 2); the reference
reduces them per-polygon to (x_min, y_min, x_max, y_max), filters
``(x_max > x_min) & (y_max > y_min)``, rescales by ``scale`` when the image
was shrunk by ``max_side`` (detect.py:91-96,116-118), and int-casts. The
shipped config leaves ``craft_net.max_side`` unset (max_side=0 — detect on
full resolution); we keep the same default and the same optional path.

The proposal stage itself (CRAFT network, not installable here) is replaced
by a deterministic projection-profile detector:
- binarize > 127;
- horizontal bands = contiguous runs of rows containing ink;
- a band taller than MAX_SINGLE_LINE_HEIGHT (56 px, the recognizer's
  single-line bound) is treated as a paragraph block -> one polygon;
- otherwise the band is split on blank column runs wider than the band
  height (word gaps are < band height; segment gaps are wider) -> one
  polygon per segment.

Emitted polygon corners use exclusive x2/y2 so downstream crops contain the
full ink extent (the reference crops PIL-style with exclusive bounds).
"""

from __future__ import annotations

import numpy as np

from .preprocess import resize_nearest
from .recognizek import MAX_SINGLE_LINE_HEIGHT

Box = tuple[int, int, int, int]


def _runs(mask: np.ndarray) -> list[tuple[int, int]]:
    if mask.size == 0:
        return []
    idx = np.flatnonzero(np.diff(np.concatenate(([0], mask.view(np.int8), [0]))))
    return [(int(idx[i]), int(idx[i + 1])) for i in range(0, len(idx), 2)]


def propose_polygons(img: np.ndarray) -> np.ndarray:
    """Grayscale (h, w) -> float32 polygons (N, 4, 2) in x,y corner order.

    Per row-band, the ink column-runs and the gap-merge are computed with
    array ops (run bounds from one diff pass, merge points from one
    vectorized gap compare) — identical output to the scalar
    run-walk/merge loop this replaces (pinned by TestDetect and the
    conformance suite), without per-glyph Python tuples."""
    binar = img > 127
    seg_parts: list[np.ndarray] = []
    row_any = binar.any(axis=1)
    for r0, r1 in _runs(row_any):
        band = binar[r0:r1]
        h = r1 - r0
        col_any = band.any(axis=0)
        idx = np.flatnonzero(
            np.diff(np.concatenate(([0], col_any.view(np.int8), [0])))
        )
        if idx.size == 0:
            continue
        c0s, c1s = idx[0::2], idx[1::2]
        if h > MAX_SINGLE_LINE_HEIGHT:
            s0 = c0s[:1]
            s1 = c1s[-1:]
        else:
            # merge ink column-runs separated by gaps <= band height:
            # a new segment starts exactly where the gap exceeds h
            brk = (c0s[1:] - c1s[:-1]) > h
            s0 = c0s[np.concatenate(([True], brk))]
            s1 = c1s[np.concatenate((brk, [True]))]
        part = np.empty((len(s0), 4), dtype=np.int64)
        part[:, 0] = s0
        part[:, 1] = s1
        part[:, 2] = r0
        part[:, 3] = r1
        seg_parts.append(part)
    if not seg_parts:
        return np.zeros((0, 4, 2), dtype=np.float32)
    segs = np.concatenate(seg_parts)
    c0, c1, r0s, r1s = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    polys = np.empty((len(segs), 4, 2), dtype=np.float32)
    polys[:, 0, 0] = c0
    polys[:, 0, 1] = r0s
    polys[:, 1, 0] = c1
    polys[:, 1, 1] = r0s
    polys[:, 2, 0] = c1
    polys[:, 2, 1] = r1s
    polys[:, 3, 0] = c0
    polys[:, 3, 1] = r1s
    return polys


def reduce_polygons(raw: np.ndarray | None, scale: float) -> list[Box]:
    """Exact reference reduction (detect.py:99-119): min/max per polygon,
    validity filter, rescale when shrunk, int cast."""
    if raw is None:
        return []
    arr = np.asarray(raw, dtype=np.float32)
    if arr.size == 0:
        return []
    xs = arr[..., 0]
    ys = arr[..., 1]
    x_min = xs.min(axis=1)
    x_max = xs.max(axis=1)
    y_min = ys.min(axis=1)
    y_max = ys.max(axis=1)
    valid = (x_max > x_min) & (y_max > y_min)
    x1 = x_min[valid]
    y1 = y_min[valid]
    x2 = x_max[valid]
    y2 = y_max[valid]
    if scale > 1:
        x1, x2 = x1 * scale, x2 * scale
        y1, y2 = y1 * scale, y2 * scale
    return list(
        zip(
            x1.astype(int).tolist(),
            y1.astype(int).tolist(),
            x2.astype(int).tolist(),
            y2.astype(int).tolist(),
        )
    )


def detect_boxes(img: np.ndarray, max_side: int = 0) -> list[Box]:
    """Full detect path (detect.py:85-119): optional max-side shrink before
    proposal, proposals, exact reduction with scale-back to input coords.

    ``max_side=0`` (the shipped default) disables the shrink.
    """
    h0, w0 = img.shape[:2]
    scale = 1.0
    work = img
    if max_side > 0:
        scale = max(h0, w0) / max_side
        if scale > 1:
            work = resize_nearest(img, int(w0 / scale), int(h0 / scale))
    return reduce_polygons(propose_polygons(work), scale)
