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

    One pass, no per-band Python loop: per-band column profiles come from
    a single ``logical_or.reduceat`` over the rows (interleaved band/gap
    segment indices, gap rows discarded), ink column-runs for ALL bands
    from one diff over the zero-padded profile matrix (per-row padding
    keeps runs from crossing band boundaries in the flattened view), and
    the gap-merge from one vectorized compare with band-change breaks.
    Identical output to the per-band run-walk this replaces — bands in
    row order, segments in column order (pinned by TestDetect and the
    conformance suite)."""
    h_img, w = img.shape
    row_any = img.max(axis=1) > 127  # no full-image binar materialization
    idx = np.flatnonzero(np.diff(np.concatenate(([0], row_any.view(np.int8), [0]))))
    if idx.size == 0:
        return np.zeros((0, 4, 2), dtype=np.float32)
    r0s, r1s = idx[0::2], idx[1::2]
    # segments [r0_i, r1_i) are bands, [r1_i, r0_i+1) gaps; a trailing
    # r1 == h_img is not a valid reduceat index and the final segment
    # runs to the end anyway
    inds = np.empty(2 * len(r0s), dtype=np.int64)
    inds[0::2] = r0s
    inds[1::2] = r1s
    if inds[-1] == h_img:
        inds = inds[:-1]
    # per-band column max (uint8) > 127 == logical_or.reduceat of (img>127)
    profiles = np.maximum.reduceat(img, inds, axis=0)[0 : 2 * len(r0s) : 2] > 127
    # ink column-runs of every band in one diff over the padded profiles
    padded = np.zeros((len(r0s), w + 2), dtype=np.int8)
    padded[:, 1:-1] = profiles
    d = np.diff(padded.ravel())
    run_idx = np.flatnonzero(d)
    starts, ends = run_idx[0::2] + 1, run_idx[1::2] + 1
    if starts.size == 0:
        return np.zeros((0, 4, 2), dtype=np.float32)
    band_of = starts // (w + 2)
    rc0 = starts % (w + 2) - 1
    rc1 = ends % (w + 2) - 1
    # segment starts: band changes always break; within a single-line
    # band a gap wider than the band height breaks; paragraph bands
    # (taller than one line) merge every run
    h_band = (r1s - r0s)[band_of]
    is_start = np.empty(len(starts), dtype=bool)
    is_start[0] = True
    same = band_of[1:] == band_of[:-1]
    gap_break = (rc0[1:] - rc1[:-1]) > h_band[1:]
    para = h_band[1:] > MAX_SINGLE_LINE_HEIGHT
    is_start[1:] = ~same | (gap_break & ~para)
    seg_i = np.flatnonzero(is_start)
    seg_j = np.append(seg_i[1:], len(starts)) - 1
    c0 = rc0[seg_i]
    c1 = rc1[seg_j]
    r0b = r0s[band_of[seg_i]]
    r1b = r1s[band_of[seg_i]]
    segs = np.empty((len(seg_i), 4), dtype=np.int64)
    segs[:, 0] = c0
    segs[:, 1] = c1
    segs[:, 2] = r0b
    segs[:, 3] = r1b
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
