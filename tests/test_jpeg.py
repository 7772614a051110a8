"""Baseline JPEG codec: roundtrip bounds (JPEG is lossy — PSNR, not bit
equality), external interop against libjpeg-produced bytes (including a
restart-marker stream), loud rejection of out-of-scope variants, and
codec-seam integration with the media feature stage."""

import base64

import numpy as np
import pyarrow as pa
import pytest

from ocr_platform_ray.functions import multimodal as mm
from ocr_platform_ray.jpegcodec import (
    _AC_CHROMA_BITS,
    _AC_CHROMA_VALS,
    _AC_LUMA_BITS,
    _AC_LUMA_VALS,
    decode_jpeg,
    encode_jpeg,
)

# 2x2.jpg from IPython's test suite (BSD-3; real libjpeg-produced bytes,
# baseline grayscale) — the decoder must agree with the wider ecosystem,
# not just roundtrip with its own encoder.
_IPYTHON_2X2 = base64.b64decode(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkS"
    "Ew8UHRofHh0aHBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/wAALCAAC"
    "AAIBAREA/8QAHwAAAQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgED"
    "AwIEAwUFBAQAAAF9AQIDAAQRBRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2Jy"
    "ggkKFhcYGRolJicoKSo0NTY3ODk6Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1"
    "dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWmp6ipqrKztLW2t7i5usLDxMXGx8jJ"
    "ytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/9oACAEBAAA/ACv/2Q=="
)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_annex_k_tables_consistent():
    assert sum(_AC_LUMA_BITS) == len(_AC_LUMA_VALS) == 162
    assert sum(_AC_CHROMA_BITS) == len(_AC_CHROMA_VALS) == 162
    # every (run, size) symbol the encoder can emit must be codeable
    need = {0x00, 0xF0} | {(r << 4) | s for r in range(16) for s in range(1, 11)}
    assert need <= set(_AC_LUMA_VALS)
    assert need <= set(_AC_CHROMA_VALS)


@pytest.mark.parametrize("shape", [(1, 1), (8, 8), (9, 17), (60, 90), (33, 41)])
def test_gray_roundtrip(shape):
    g = (
        np.add.outer(np.arange(shape[0]), np.arange(shape[1])) * 3
    ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=90))
    assert dec.shape == shape
    assert _psnr(g, dec) > 35


def test_flat_image_is_exact():
    flat = np.full((33, 41), 130, np.uint8)
    assert (decode_jpeg(encode_jpeg(flat, quality=85)) == flat).all()


def test_noise_quality_ladder():
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (48, 48), np.uint8)
    p95 = _psnr(noise, decode_jpeg(encode_jpeg(noise, quality=95)))
    p50 = _psnr(noise, decode_jpeg(encode_jpeg(noise, quality=50)))
    assert p95 > 30
    assert p95 > p50  # coarser quantization must lose more


@pytest.mark.parametrize("subsample", ["444", "420"])
@pytest.mark.parametrize("shape", [(50, 70), (7, 7), (16, 24)])
def test_color_roundtrip(shape, subsample):
    h, w = shape
    c = np.stack(
        [
            (np.add.outer(np.arange(h), np.arange(w)) * 2).astype(np.uint8),
            np.full((h, w), 90, np.uint8),
            np.tile((np.arange(w) * 3) % 256, (h, 1)).astype(np.uint8),
        ],
        axis=-1,
    )
    dec = decode_jpeg(encode_jpeg(c, quality=90, subsample=subsample))
    assert dec.shape == (h, w, 3)
    assert _psnr(c, dec) > (40 if subsample == "444" else 28)


def test_external_interop_grayscale():
    # real libjpeg bytes decode; 2x2.jpg is a uniform mid-gray probe image
    arr = decode_jpeg(_IPYTHON_2X2)
    assert arr.shape == (2, 2)
    assert arr.dtype == np.uint8
    assert (arr == 128).all()


def test_external_interop_color_with_restart_markers():
    # flower_of_life.jpg (requests' test asset, Apache-2.0): baseline
    # YCbCr 4:4:4 with DRI=21 restart intervals — a black-line-on-white
    # geometric figure, so the decode must be near-grayscale with a pure
    # white border.
    import os

    path = os.path.join(os.path.dirname(__file__), "goldens",
                        "flower_of_life.jpg")
    arr = decode_jpeg(open(path, "rb").read())
    assert arr.shape == (161, 161, 3)
    assert (arr[0, 0] == 255).all() and (arr[-1, -1] == 255).all()
    # content is achromatic: channel means agree to well under one level
    means = arr.mean(axis=(0, 1))
    assert np.ptp(means) < 1.0
    assert 200 < means[0] < 230  # mostly white, substantial dark linework


def test_fill_bytes_before_markers_are_skipped():
    # T.81 B.1.1.2: any marker may be padded with extra 0xFF fill bytes
    g = np.add.outer(np.arange(24), np.arange(24)).astype(np.uint8)
    full = encode_jpeg(g, quality=90)
    base = decode_jpeg(full)
    # inject fill bytes before the SOF0 marker (FF C0 -> FF FF FF C0)
    sof = full.index(b"\xff\xc0")
    padded = full[:sof] + b"\xff\xff" + full[sof:]
    assert (decode_jpeg(padded) == base).all()


def test_rejects_progressive_loudly():
    sof2 = bytes([0xFF, 0xC2, 0x00, 0x0B, 8, 0, 8, 0, 8, 1, 1, 0x11, 0])
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(b"\xff\xd8" + sof2)


def test_rejects_garbage_and_truncation():
    with pytest.raises(ValueError, match="signature"):
        decode_jpeg(b"not a jpeg")
    full = encode_jpeg(np.add.outer(np.arange(64), np.arange(64)).astype(np.uint8))
    for frac in (0.5, 0.97):  # mid-header and mid-scan truncation
        with pytest.raises(ValueError):
            decode_jpeg(full[: int(len(full) * frac)])


def test_jpeg_codec_in_feature_stage():
    # the codec seam end-to-end: a jpeg payload through MediaDecodeFeatures
    # lands within lossy tolerance of the same raster's npy features
    rng = np.random.default_rng(11)
    base = np.add.outer(np.arange(40), np.arange(60)).astype(np.uint8)
    arr = np.clip(base + rng.integers(0, 30, base.shape), 0, 255).astype(np.uint8)
    meta = {"width": 60, "height": 40, "n_frames": 1, "sample_rate": 0}
    rows = [
        {"media_id": "a", "kind": "image", "codec": "npy",
         "payload": mm.encode_array(arr), "meta": meta},
        {"media_id": "b", "kind": "image", "codec": "jpeg",
         "payload": encode_jpeg(arr, quality=95), "meta": meta},
    ]
    t = pa.Table.from_pylist(rows, schema=mm.MEDIA_SCHEMA)
    out = mm.MediaDecodeFeatures()(t).to_pylist()
    a, b = out
    assert (a["width"], a["height"]) == (b["width"], b["height"])
    assert abs(a["mean_intensity"] - b["mean_intensity"]) < 1.0
    assert abs(a["ink_ratio"] - b["ink_ratio"]) < 0.02
