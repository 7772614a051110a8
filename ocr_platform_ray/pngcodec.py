"""Pure-stdlib PNG codec (zlib + numpy, no PIL/cv2) for the multimodal
'png' codec branch (reference decodes rasters via PIL —
/root/reference/apps/worker/app/tasks/ocr_tasks.py:54-55; this sandbox has
no image library, so the format is implemented from the public spec,
RFC 2083 / W3C PNG).

Scope — the raster shapes this engine processes:

- bit depth 8, color types 0 (grayscale), 2 (RGB), 4 (gray+alpha),
  6 (RGBA); non-interlaced. Palette (3) and sub-byte depths raise
  NotImplementedError loudly (the corpora here never produce them).
- decode handles ALL five scanline filters (None/Sub/Up/Average/Paeth):
  Sub is a per-row modular cumsum, Up a vectorized add of the previous
  reconstructed row; Average/Paeth carry a left-pixel dependence, so they
  fall back to a per-pixel loop on the rows that use them (PNGs encoded
  by this module always use filter 0, so the hot decode path is fully
  vectorized).
- encode writes filter 0 scanlines (optionally another filter, used by
  the tests to exercise every decode branch).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (bit depth 8 only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode a uint8 array as PNG: (h, w) -> grayscale, (h, w, 2) ->
    gray+alpha, (h, w, 3) -> RGB, (h, w, 4) -> RGBA."""
    a = np.ascontiguousarray(arr)
    if a.dtype != np.uint8:
        raise ValueError(f"encode_png needs uint8, got {a.dtype}")
    if a.ndim == 2:
        color, ch = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] in (2, 3, 4):
        ch = a.shape[2]
        color = {2: 4, 3: 2, 4: 6}[ch]
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    raw = a.reshape(h, w * ch).astype(np.int16)
    bpp = ch  # bytes per pixel at depth 8
    if filter_type == 0:
        filt = raw
    elif filter_type == 1:  # Sub: raw[i] - recon[i-bpp]
        left = np.zeros_like(raw)
        left[:, bpp:] = raw[:, :-bpp]
        filt = raw - left
    elif filter_type == 2:  # Up
        up = np.zeros_like(raw)
        up[1:] = raw[:-1]
        filt = raw - up
    elif filter_type == 3:  # Average
        left = np.zeros_like(raw)
        left[:, bpp:] = raw[:, :-bpp]
        up = np.zeros_like(raw)
        up[1:] = raw[:-1]
        filt = raw - (left + up) // 2
    elif filter_type == 4:  # Paeth
        left = np.zeros_like(raw)
        left[:, bpp:] = raw[:, :-bpp]
        up = np.zeros_like(raw)
        up[1:] = raw[:-1]
        ul = np.zeros_like(raw)
        ul[1:, bpp:] = raw[:-1, :-bpp]
        filt = raw - _paeth(left, up, ul)
    else:
        raise ValueError(f"unknown filter type {filter_type}")
    lines = np.empty((h, 1 + w * ch), dtype=np.uint8)
    lines[:, 0] = filter_type
    lines[:, 1:] = (filt % 256).astype(np.uint8)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(lines.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (spec: nearest of left/up/upper-left to
    the linear estimate, ties broken left, up, upper-left)."""
    p = a + b - c
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    return np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG to a uint8 array: grayscale -> (h, w), multi-channel
    -> (h, w, ch). Bit depth 8, color types 0/2/4/6, non-interlaced."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt_method, interlace = ihdr
    if depth != 8 or color not in _CHANNELS:
        raise NotImplementedError(
            f"PNG depth={depth} color_type={color} unsupported (need depth 8,"
            " color type 0/2/4/6)"
        )
    if comp != 0 or filt_method != 0:
        raise ValueError("invalid PNG compression/filter method")
    if interlace != 0:
        raise NotImplementedError("interlaced (Adam7) PNG unsupported")
    ch = _CHANNELS[color]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data has wrong length")
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = lines[:, 0]
    if ftypes.max(initial=0) > 4:
        raise ValueError(f"invalid PNG filter type {int(ftypes.max())}")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = ch
    for y in range(h):
        row = lines[y, 1:]
        ft = int(ftypes[y])
        if ft == 0:
            rec = row.copy()
        elif ft == 1:
            # Sub: recon[i] = row[i] + recon[i-bpp] — a modular prefix sum
            # over the byte lanes, vectorized via int cumsum then mod 256
            rec = (
                np.cumsum(row.reshape(-1, bpp), axis=0, dtype=np.int64) % 256
            ).astype(np.uint8).reshape(-1)
        elif ft == 2:
            rec = row + prev  # uint8 wraparound == mod-256 add
        elif ft == 3:
            rec = np.empty(stride, dtype=np.uint8)
            p = prev.astype(np.int32)
            rec[:bpp] = row[:bpp] + (p[:bpp] // 2).astype(np.uint8)
            for i in range(bpp, stride):
                rec[i] = (row[i] + (int(rec[i - bpp]) + int(p[i])) // 2) % 256
        else:  # Paeth
            rec = np.empty(stride, dtype=np.uint8)
            p = prev.astype(np.int32)
            rec[:bpp] = row[:bpp] + prev[:bpp]  # left/ul are 0 -> pred=up
            for i in range(bpp, stride):
                a, b, c = int(rec[i - bpp]), int(p[i]), int(prev[i - bpp])
                pr = a + b - c
                pa_, pb, pc = abs(pr - a), abs(pr - b), abs(pr - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                rec[i] = (int(row[i]) + pred) % 256
        out[y] = rec
        prev = rec
    if ch == 1:
        return out.reshape(h, w)
    return out.reshape(h, w, ch)
