"""Perceptual-hash image dedup: codec invariance (npy vs png of the same
raster hash identically), noise robustness (small perturbation -> small
Hamming distance), and planted duplicates surfacing through the shared
pigeonhole blocker end to end."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ocr_platform_ray.functions.multimodal import (
    MEDIA_SCHEMA,
    PerceptualHash,
    encode_array,
    image_dup_pairs,
)
from ocr_platform_ray.pngcodec import encode_png


def _media_row(mid: str, arr: np.ndarray, codec: str) -> dict:
    payload = encode_png(arr) if codec == "png" else encode_array(arr)
    return {
        "media_id": mid,
        "kind": "image",
        "codec": codec,
        "payload": payload,
        "meta": {
            "width": arr.shape[1],
            "height": arr.shape[0],
            "n_frames": 1,
            "sample_rate": 0,
        },
    }


def _hash_rows(rows: list[dict]) -> pd.DataFrame:
    t = pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)
    return PerceptualHash()(t).to_pandas()


def _image(seed: int, h: int = 120, w: int = 200) -> np.ndarray:
    rng = np.random.RandomState(seed)
    # smooth structure + texture: dHash is about gradient signs
    yy, xx = np.mgrid[0:h, 0:w]
    base = 128 + 80 * np.sin(xx / (10 + seed % 7)) + 40 * np.cos(yy / 9)
    return np.clip(base + rng.randn(h, w) * 8, 0, 255).astype(np.uint8)


def _hamming(a, b) -> int:
    return bin((int(a) & 0xFFFFFFFFFFFFFFFF) ^ (int(b) & 0xFFFFFFFFFFFFFFFF)).count("1")


class TestPerceptualHash:
    def test_codec_invariance(self):
        arr = _image(3)
        df = _hash_rows(
            [_media_row("media-00000000", arr, "npy"),
             _media_row("media-00000001", arr, "png")]
        )
        assert df["phash64"].iloc[0] == df["phash64"].iloc[1]

    def test_noise_robust_and_discriminative(self):
        a = _image(5)
        noisy = np.clip(
            a.astype(np.int16) + np.random.RandomState(0).randint(-6, 7, a.shape),
            0, 255,
        ).astype(np.uint8)
        other = _image(11)
        df = _hash_rows(
            [_media_row("media-00000000", a, "npy"),
             _media_row("media-00000001", noisy, "npy"),
             _media_row("media-00000002", other, "npy")]
        )
        h = df["phash64"].tolist()
        assert _hamming(h[0], h[1]) <= 3          # near-dup stays near
        assert _hamming(h[0], h[2]) > 10          # distinct stays far

    def test_rescale_invariance(self):
        # mean-pool hashing is scale-tolerant: a 2x nearest-upscale of the
        # same image pools to (nearly) the same cells
        a = _image(7, h=64, w=96)
        big = np.repeat(np.repeat(a, 2, axis=0), 2, axis=1)
        df = _hash_rows(
            [_media_row("media-00000000", a, "npy"),
             _media_row("media-00000001", big, "npy")]
        )
        assert _hamming(df["phash64"].iloc[0], df["phash64"].iloc[1]) <= 2


class TestImageDupPairs:
    def test_planted_duplicates_found(self, ray_session):
        """A controlled media table with one exact-duplicate image, one
        noisy near-dup and distinct distractors: the blocker must surface
        the planted pairs and nothing between distinct images."""
        from ocr_platform_ray.functions.multimodal import (
            image_dup_pairs_from_media,
        )

        a = _image(5)
        noisy = np.clip(
            a.astype(np.int16)
            + np.random.RandomState(1).randint(-4, 5, a.shape),
            0, 255,
        ).astype(np.uint8)
        rows = [
            _media_row("media-00000007", a, "npy"),
            _media_row("media-00000042", a, "png"),      # exact dup of 7
            _media_row("media-00000099", noisy, "npy"),  # near dup of 7
        ]
        rows += [
            _media_row(f"media-{100 + i:08d}", _image(20 + i), "npy")
            for i in range(12)
        ]
        media = rd.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA))
        pairs = image_dup_pairs_from_media(media.repartition(4)).to_pandas()
        exact = pairs[(pairs.doc_a == 7) & (pairs.doc_b == 42)]
        assert len(exact) == 1 and exact["hamming"].iloc[0] == 0
        near = pairs[(pairs.doc_a == 7) & (pairs.doc_b == 99)]
        assert len(near) == 1 and near["hamming"].iloc[0] <= 3
        # distractors must not pair with the planted trio
        others = pairs[~pairs.doc_a.isin([7, 42, 99])]
        assert (others.doc_b.isin([7, 42, 99]) == False).all()  # noqa: E712

    def test_max_hamming_guard(self):
        import pytest

        with pytest.raises(ValueError):
            image_dup_pairs("/root/testdata/sf0.001", max_hamming=4)
