"""Pure-stdlib MP4 / ISO BMFF container codec (struct + numpy, no ffmpeg)
for the multimodal 'mp4' codec branch (reference decodes media via
PIL/PyMuPDF — /root/reference/apps/worker/app/tasks/ocr_tasks.py:34-55;
this sandbox has no media library, so the CONTAINER format is implemented
from the public spec, ISO/IEC 14496-12 "ISO base media file format").

Scope — an honest split of what is container vs codec:

- **Demux is general**: :func:`demux_mp4` walks the box tree of ANY mp4
  (32- and 64-bit box sizes, version 0/1 mvhd/mdhd/tkhd), locates each
  track's sample table (stsd/stts/stsc/stsz/stco|co64) and returns the
  per-sample byte ranges, timing and the sample-entry fourcc. That is
  everything a frame-sampling pipeline needs short of bitstream decode.
- **Bitstream decode covers intra-frame codecs only**: :func:`decode_mp4`
  decodes the private ``gry8`` sample entry written by :func:`mux_mp4`
  (raw 8-bit grayscale, one sample per frame, VisualSampleEntry layout)
  AND Motion-JPEG tracks (``jpeg`` / ``mjpa`` sample entries — each
  sample is an independent baseline JPEG, decoded by the repo's
  pure-stdlib ``jpegcodec``; :func:`mux_mp4_mjpeg` writes them).
  Inter-frame codecs (avc1/hev1/…) need a real decoder and raise
  NotImplementedError NAMING the fourcc — the single remaining marked
  seam of the media layer.

The muxer writes spec-shaped boxes (ftyp/mdat/moov with a full
trak/mdia/minf/stbl chain) so the demuxer is exercised against real
container structure, and tests additionally pin the demuxer against a
hand-assembled byte layout that does not share code with the muxer.
"""

from __future__ import annotations

import struct

import numpy as np

# private sample-entry fourcc: raw 8-bit grayscale frames, row-major
RAW_GRAY_FOURCC = "gry8"

# standard Photo-/Motion-JPEG sample entries (QuickTime File Format spec
# "jpeg"; "mjpa" is MJPEG-A with an identical per-sample JPEG payload)
MJPEG_FOURCCS = ("jpeg", "mjpa")

_MVHD_MATRIX = (
    struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
)


def _box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + tag + body


def _full(tag: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(tag, struct.pack(">I", (version << 24) | flags) + body)


# ---------------------------------------------------------------------- mux

def _sample_entry(fourcc: str, w: int, h: int, depth: int) -> bytes:
    """VisualSampleEntry (ISO 14496-12 §12.1.3)."""
    return _box(
        fourcc.encode(),
        b"\x00" * 6 + struct.pack(">H", 1)           # reserved, data_ref_index
        + b"\x00" * 16                               # pre_defined/reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)                       # frame_count
        + b"\x00" * 32                               # compressorname
        + struct.pack(">Hh", depth, -1),             # depth, pre_defined
    )


def mux_mp4(frames: np.ndarray, fps: int = 12) -> bytes:
    """Mux raw grayscale frames — (n, h, w) uint8 — into an ISO BMFF file:
    one video track, one sample per frame, all samples in one chunk, the
    private ``gry8`` sample entry carrying the dimensions. Timescale is
    ``fps`` with sample delta 1, so duration == frame count."""
    a = np.ascontiguousarray(frames)
    if a.dtype != np.uint8 or a.ndim != 3:
        raise ValueError(f"mux_mp4 needs (n,h,w) uint8, got {a.dtype} {a.shape}")
    n, h, w = a.shape
    if n == 0 or h == 0 or w == 0:
        raise ValueError("empty frame stack")
    if fps <= 0:
        raise ValueError("fps must be positive")
    return _mux_samples(
        [a[i].tobytes() for i in range(n)], w, h, fps,
        _sample_entry(RAW_GRAY_FOURCC, w, h, 8),
    )


def mux_mp4_mjpeg(frames: np.ndarray, fps: int = 12,
                  quality: int = 85) -> bytes:
    """Motion-JPEG mux: each frame — (n, h, w) gray or (n, h, w, 3) RGB
    uint8 — becomes an independent baseline-JPEG sample (the repo's
    pure-stdlib encoder) under the standard ``jpeg`` sample entry, so
    any Photo-JPEG-capable player demuxes the result and
    :func:`decode_mp4` roundtrips it without a private fourcc."""
    a = np.ascontiguousarray(frames)
    if a.dtype != np.uint8 or a.ndim not in (3, 4) or (
        a.ndim == 4 and a.shape[3] != 3
    ):
        raise ValueError(
            f"mux_mp4_mjpeg needs (n,h,w)[,3] uint8, got {a.dtype} {a.shape}"
        )
    n, h, w = a.shape[:3]
    if n == 0 or h == 0 or w == 0:
        raise ValueError("empty frame stack")
    if fps <= 0:
        raise ValueError("fps must be positive")
    from .jpegcodec import encode_jpeg

    samples = [encode_jpeg(a[i], quality=quality) for i in range(n)]
    depth = 24 if a.ndim == 4 else 8
    return _mux_samples(
        samples, w, h, fps, _sample_entry("jpeg", w, h, depth)
    )


def _mux_samples(samples: list, w: int, h: int, fps: int,
                 entry: bytes) -> bytes:
    """Assemble the container: one video track, one sample per frame,
    all samples in one chunk; uniform stsz when every sample has the
    same size (the raw-gray layout), per-sample stsz otherwise."""
    n = len(samples)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    mdat = _box(b"mdat", b"".join(samples))
    mdat_payload_offset = len(ftyp) + 8  # first sample byte in the file

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, fps, n)          # created/modified/timescale/duration
        + struct.pack(">iHH", 0x00010000, 0x0100, 0)  # rate 1.0, volume 1.0
        + b"\x00" * 8
        + _MVHD_MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 2),                      # next_track_id
    )
    tkhd = _full(
        b"tkhd", 0, 3,                               # enabled | in-movie
        struct.pack(">IIIII", 0, 0, 1, 0, n)         # track_id 1, duration n
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)           # layer/group/volume/rsvd
        + _MVHD_MATRIX
        + struct.pack(">II", w << 16, h << 16),      # 16.16 fixed
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, fps, n) + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
    )

    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    sizes = [len(s) for s in samples]
    if len(set(sizes)) == 1:
        stsz = _full(b"stsz", 0, 0, struct.pack(">III", sizes[0], n, 0))
    else:
        stsz = _full(
            b"stsz", 0, 0,
            struct.pack(">II", 0, n) + struct.pack(f">{n}I", *sizes),
        )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, mdat_payload_offset))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# -------------------------------------------------------------------- demux

def _walk(buf: bytes, start: int, end: int):
    """Yield (tag, payload_start, payload_end) for each box in [start, end)."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", buf, pos)[0]
        tag = buf[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if body + 8 > end:
                raise ValueError("truncated largesize box")
            size = struct.unpack_from(">Q", buf, body)[0]
            body += 8
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"malformed box {tag!r} at {pos}")
        yield tag, body, pos + size
        pos += size


def _children(buf: bytes, start: int, end: int) -> dict:
    """First child of each tag inside a container box."""
    out = {}
    for tag, b, e in _walk(buf, start, end):
        out.setdefault(tag, (b, e))
    return out


def _fullbox(buf: bytes, span: tuple) -> tuple:
    b, e = span
    version = buf[b]
    return version, b + 4, e


def demux_mp4(payload: bytes) -> dict:
    """Parse the container: movie timescale/duration plus, per video
    track, dimensions, sample-entry fourcc, per-sample (offset, size)
    ranges into ``payload`` and the stts deltas. Pure box walk — no
    bitstream decode, so it works on any conforming mp4."""
    top = {}
    for tag, b, e in _walk(payload, 0, len(payload)):
        top.setdefault(tag, (b, e))
    if b"moov" not in top:
        raise ValueError("not an mp4: no moov box")
    moov_b, moov_e = top[b"moov"]
    out = {"timescale": 0, "duration": 0, "tracks": []}
    tracks = []
    for tag, b, e in _walk(payload, moov_b, moov_e):
        if tag == b"mvhd":
            v, p, _ = _fullbox(payload, (b, e))
            if v == 1:
                out["timescale"], out["duration"] = struct.unpack_from(
                    ">IQ", payload, p + 16
                )
            else:
                out["timescale"], out["duration"] = struct.unpack_from(
                    ">II", payload, p + 8
                )
        elif tag == b"trak":
            tracks.append((b, e))
    for tb, te in tracks:
        kids = _children(payload, tb, te)
        if b"mdia" not in kids:
            continue
        mdia = _children(payload, *kids[b"mdia"])
        if b"hdlr" in mdia:
            _, p, _ = _fullbox(payload, mdia[b"hdlr"])
            handler = payload[p + 4 : p + 8].decode("latin1")
        else:
            handler = "????"
        track = {"handler": handler, "track_id": 0, "width": 0, "height": 0}
        if b"tkhd" in kids:
            v, p, _ = _fullbox(payload, kids[b"tkhd"])
            track["track_id"] = struct.unpack_from(
                ">I", payload, p + (16 if v == 1 else 8)
            )[0]
            # width/height are the last 8 bytes of tkhd, 16.16 fixed
            wh_off = kids[b"tkhd"][1] - 8
            fw, fh = struct.unpack_from(">II", payload, wh_off)
            track["width"], track["height"] = fw >> 16, fh >> 16
        if b"minf" not in mdia:
            out["tracks"].append(track)
            continue
        minf = _children(payload, *mdia[b"minf"])
        if b"stbl" not in minf:
            out["tracks"].append(track)
            continue
        stbl = _children(payload, *minf[b"stbl"])

        # sample-entry fourcc (first stsd entry)
        _, p, _ = _fullbox(payload, stbl[b"stsd"])
        track["fourcc"] = payload[p + 8 : p + 12].decode("latin1")

        # stsz: uniform or per-sample sizes
        _, p, _ = _fullbox(payload, stbl[b"stsz"])
        uniform, count = struct.unpack_from(">II", payload, p)
        if uniform:
            sizes = np.full(count, uniform, dtype=np.int64)
        else:
            sizes = np.frombuffer(
                payload, dtype=">u4", count=count, offset=p + 8
            ).astype(np.int64)

        # chunk offsets: stco (32-bit) or co64
        if b"stco" in stbl:
            _, p, _ = _fullbox(payload, stbl[b"stco"])
            n_chunks = struct.unpack_from(">I", payload, p)[0]
            chunk_offs = np.frombuffer(
                payload, dtype=">u4", count=n_chunks, offset=p + 4
            ).astype(np.int64)
        else:
            _, p, _ = _fullbox(payload, stbl[b"co64"])
            n_chunks = struct.unpack_from(">I", payload, p)[0]
            chunk_offs = np.frombuffer(
                payload, dtype=">u8", count=n_chunks, offset=p + 4
            ).astype(np.int64)

        # stsc: expand (first_chunk, samples_per_chunk) runs
        _, p, _ = _fullbox(payload, stbl[b"stsc"])
        n_runs = struct.unpack_from(">I", payload, p)[0]
        runs = [
            struct.unpack_from(">III", payload, p + 4 + 12 * i)[:2]
            for i in range(n_runs)
        ]
        spc = np.empty(n_chunks, dtype=np.int64)
        for i, (first, per) in enumerate(runs):
            last = runs[i + 1][0] - 1 if i + 1 < n_runs else n_chunks
            spc[first - 1 : last] = per

        # per-sample offsets: walk chunks, cumsum sizes within each
        offsets = np.empty(len(sizes), dtype=np.int64)
        si = 0
        for ci in range(n_chunks):
            k = int(spc[ci])
            sz = sizes[si : si + k]
            offsets[si : si + k] = chunk_offs[ci] + np.concatenate(
                ([0], np.cumsum(sz[:-1]))
            )
            si += k
        track["sample_sizes"] = sizes
        track["sample_offsets"] = offsets

        # stts deltas (expanded)
        _, p, _ = _fullbox(payload, stbl[b"stts"])
        n_tt = struct.unpack_from(">I", payload, p)[0]
        deltas = np.concatenate(
            [
                np.full(c, d, dtype=np.int64)
                for c, d in (
                    struct.unpack_from(">II", payload, p + 4 + 8 * i)
                    for i in range(n_tt)
                )
            ]
        ) if n_tt else np.empty(0, dtype=np.int64)
        track["sample_deltas"] = deltas
        out["tracks"].append(track)
    return out


def extract_samples(payload: bytes, track: dict) -> list[bytes]:
    """Raw per-sample byte strings for a demuxed track (compressed or
    not — this is the container's job, not the codec's)."""
    return [
        payload[o : o + s]
        for o, s in zip(track["sample_offsets"], track["sample_sizes"])
    ]


def decode_mp4(payload: bytes) -> np.ndarray:
    """Decode the first video track to (n, h, w) uint8. The private
    raw-grayscale ``gry8`` entry and Motion-JPEG (``jpeg``/``mjpa``,
    every sample an independent baseline JPEG) decode here; color MJPEG
    samples reduce to BT.601 luma so the frame-stack contract stays
    (n, h, w). Inter-frame codecs raise loudly with their fourcc
    (bitstream decode needs ffmpeg — the documented remaining seam)."""
    info = demux_mp4(payload)
    vids = [t for t in info["tracks"] if t.get("fourcc")]
    if not vids:
        raise ValueError("mp4 has no sampled track")
    t = vids[0]
    if t["fourcc"] in MJPEG_FOURCCS:
        from .jpegcodec import decode_jpeg

        frames = []
        for i, raw in enumerate(extract_samples(payload, t)):
            a = decode_jpeg(raw)
            if a.ndim == 3:  # BT.601 luma, same coefficients the encoder uses
                a = np.clip(
                    np.round(
                        0.299 * a[..., 0]
                        + 0.587 * a[..., 1]
                        + 0.114 * a[..., 2]
                    ),
                    0, 255,
                ).astype(np.uint8)
            frames.append(a)
        shapes = {f.shape for f in frames}
        if len(shapes) != 1:
            raise ValueError(f"mjpeg samples disagree on dims: {shapes}")
        return np.stack(frames)
    if t["fourcc"] != RAW_GRAY_FOURCC:
        raise NotImplementedError(
            f"mp4 sample entry {t['fourcc']!r} needs a bitstream decoder "
            "not present in this environment (container demux succeeded; "
            f"{RAW_GRAY_FOURCC!r} raw-grayscale and Motion-JPEG "
            f"{MJPEG_FOURCCS} decode here)"
        )
    h, w = t["height"], t["width"]
    if h <= 0 or w <= 0:
        raise ValueError("gry8 track missing dimensions")
    frames = np.empty((len(t["sample_sizes"]), h, w), dtype=np.uint8)
    for i, raw in enumerate(extract_samples(payload, t)):
        if len(raw) != h * w:
            raise ValueError(
                f"sample {i}: {len(raw)} bytes != {h}x{w}"
            )
        frames[i] = np.frombuffer(raw, dtype=np.uint8).reshape(h, w)
    return frames
