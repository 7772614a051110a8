"""Multimodal binary-column plumbing: npy, png, jpeg and wav decode paths
are real end-to-end (jpeg covered in tests/test_jpeg.py); unknown codecs
raise the documented stub error; frame sampling explodes video payloads."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from ocr_platform_ray.functions import multimodal as mm
from ocr_platform_ray.pngcodec import decode_png, encode_png


def _img_row(mid, arr, codec="npy"):
    if codec == "npy":
        payload = mm.encode_array(arr)
    elif codec == "png":
        payload = encode_png(arr)
    else:
        payload = b"\xff\xd8\xff..."  # opaque bytes for stubbed codecs
    return {
        "media_id": mid,
        "kind": "image",
        "codec": codec,
        "payload": payload,
        "meta": {
            "width": arr.shape[-1],
            "height": arr.shape[-2],
            "n_frames": arr.shape[0] if arr.ndim == 3 else 1,
            "sample_rate": 0,
        },
    }


def test_npy_roundtrip_features():
    arr = np.zeros((40, 60), dtype=np.uint8)
    arr[10:20, 5:25] = 255
    t = pa.Table.from_pylist([_img_row("m1", arr)], schema=mm.MEDIA_SCHEMA)
    out = mm.MediaDecodeFeatures()(t).to_pylist()[0]
    assert (out["width"], out["height"]) == (60, 40)
    assert out["ink_ratio"] == round(200 / 2400, 6)
    assert len(out["histogram"]) == 16
    assert abs(sum(out["histogram"]) - 1.0) < 1e-6


def test_resize_applied():
    arr = np.zeros((300, 1500), dtype=np.uint8)
    t = pa.Table.from_pylist([_img_row("m1", arr)], schema=mm.MEDIA_SCHEMA)
    out = mm.MediaDecodeFeatures(max_side=1200)(t).to_pylist()[0]
    assert out["width"] == 1200 and out["height"] == 240


def test_unknown_codec_is_stubbed():
    arr = np.zeros((4, 4), dtype=np.uint8)
    t = pa.Table.from_pylist(
        [_img_row("m1", arr, codec="webm")], schema=mm.MEDIA_SCHEMA
    )
    with pytest.raises(NotImplementedError, match="codec 'webm'"):
        mm.MediaDecodeFeatures()(t)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize(
    "shape", [(1, 1), (5, 3), (33, 17), (8, 8, 2), (20, 30, 3), (9, 4, 4)]
)
def test_png_roundtrip(shape, filter_type):
    rng = np.random.default_rng(hash((shape, filter_type)) % (2**32))
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_png(encode_png(arr, filter_type=filter_type))
    assert out.shape == arr.shape
    assert (out == arr).all()


def test_png_gradient_all_filters():
    # gradients stress the predictive filters (Sub/Up/Average/Paeth)
    g = np.add.outer(np.arange(100), np.arange(200)).astype(np.uint8)
    for ft in range(5):
        assert (decode_png(encode_png(g, filter_type=ft)) == g).all()


def test_png_external_interop():
    # PNGs produced by external encoders (libpng), published constants:
    # the codec must agree with the wider ecosystem, not just roundtrip
    import base64

    red_rgb = base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAIAAACQd1PeAAAADElEQVR4nGP4z8AA"
        "AAMBAQDJ/pLvAAAAAElFTkSuQmCC"
    )
    arr = decode_png(red_rgb)
    assert arr.shape == (1, 1, 3)
    assert arr.ravel().tolist() == [255, 0, 0]


def test_png_rejects_unsupported():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")
    # interlaced flag set -> loud NotImplementedError, not silent garbage
    import struct
    import zlib

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr_body = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 1)  # interlace=1

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    bad = sig + chunk(b"IHDR", ihdr_body) + chunk(
        b"IDAT", zlib.compress(b"\x00\x00")
    ) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_png(bad)


def test_png_codec_features_match_npy():
    # the same raster through both codecs must yield identical features
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(50, 70), dtype=np.uint8)
    t = pa.Table.from_pylist(
        [_img_row("a", arr, codec="npy"), _img_row("b", arr, codec="png")],
        schema=mm.MEDIA_SCHEMA,
    )
    out = mm.MediaDecodeFeatures()(t).to_pylist()
    a, b = out[0], out[1]
    for k in ("width", "height", "mean_intensity", "ink_ratio", "histogram"):
        assert a[k] == b[k], k


def test_frame_sample_explodes_video():
    vid = np.stack([np.full((8, 8), i, dtype=np.uint8) for i in range(6)])
    t = pa.Table.from_pylist([_img_row("v1", vid)], schema=mm.MEDIA_SCHEMA)
    out = mm.FrameSample(every_k=2)(t)
    assert out.column("frame_idx").to_pylist() == [0, 2, 4]
    f2 = np.load(__import__("io").BytesIO(out.column("payload").to_pylist()[1]))
    assert f2[0, 0] == 2


def test_media_features_pipeline():
    out = mm.media_features("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 100
    assert (out["width"] > 0).all()
    assert out["media_id"].is_unique


def test_media_table_mixes_codecs():
    # even doc ids carry png payloads, odd npy — both real decode paths
    # run in the production media pipeline, not just in unit tests
    t = mm.media_table_from_documents("/root/testdata/sf0.001", limit=64)
    df = t.to_pandas()
    codecs = set(df["codec"])
    assert codecs == {"png", "npy"}
    for _, row in df.head(8).iterrows():
        arr = mm._decode_payload(row["codec"], row["payload"])
        assert arr.shape == (row["meta"]["height"], row["meta"]["width"])


def test_wav_roundtrip_mono_stereo():
    rng = np.random.default_rng(11)
    mono = rng.integers(-32768, 32767, size=1000, dtype=np.int16)
    got, rate = mm.decode_wav(mm.encode_wav(mono, 8000))
    assert rate == 8000 and got.shape == mono.shape and (got == mono).all()
    stereo = rng.integers(-32768, 32767, size=(500, 2), dtype=np.int16)
    got2, rate2 = mm.decode_wav(mm.encode_wav(stereo))
    assert rate2 == 16000 and got2.shape == (500, 2) and (got2 == stereo).all()


def test_synth_audio_deterministic():
    a, b = mm.synth_audio(42), mm.synth_audio(42)
    assert a.dtype == np.int16 and (a == b).all()
    assert not (mm.synth_audio(43) == a).all()


def test_audio_features_known_signal():
    # full-scale square wave: rms == peak == 1 - 1/32768, one zero
    # crossing per half-period
    sr = 8000
    sq = np.where(np.arange(800) % 8 < 4, 32767, -32767).astype(np.int16)
    t = pa.Table.from_pylist(
        [{
            "media_id": "sq", "kind": "audio", "codec": "wav",
            "payload": mm.encode_wav(sq, sr),
            "meta": {"width": 0, "height": 0, "n_frames": 800,
                     "sample_rate": sr},
        }],
        schema=mm.MEDIA_SCHEMA,
    )
    out = mm.AudioFeatures()(t).to_pylist()[0]
    assert out["duration_s"] == 0.1
    assert out["peak"] == round(32767 / 32768, 6)
    assert out["rms"] == round(32767 / 32768, 6)
    assert out["zero_crossing_rate"] == round((800 // 4 - 1) / 800, 6)


def test_audio_features_pipeline():
    out = mm.audio_features("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 500
    assert (out["duration_s"] == 0.25).all()
    assert (out["rms"] > 0).all() and (out["peak"] <= 1.0).all()
