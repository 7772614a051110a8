"""Multimodal binary-column plumbing: npy decode path is real end-to-end;
unknown codecs raise the documented stub error; frame sampling explodes
video payloads."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from ocr_platform_ray.functions import multimodal as mm


def _img_row(mid, arr, codec="npy"):
    return {
        "media_id": mid,
        "kind": "image",
        "codec": codec,
        "payload": mm.encode_array(arr) if codec == "npy" else b"\x89PNG...",
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
    t = pa.Table.from_pylist([_img_row("m1", arr, codec="png")], schema=mm.MEDIA_SCHEMA)
    with pytest.raises(NotImplementedError, match="codec 'png'"):
        mm.MediaDecodeFeatures()(t)


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
