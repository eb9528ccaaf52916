"""Pure-numpy codecs for uncompressed container formats (BMP, WAV).

These are REAL codecs for real formats — any stock image viewer opens
the BMP output, any audio player the WAV — implemented with
struct+numpy so the decode path has no PIL/ffmpeg dependency (both
absent in this container). They make the multimodal decode pipeline
end-to-end real for the uncompressed formats; COMPRESSED formats
(PNG/JPEG/FLAC/MP3) still require a codec library and remain behind
the ``_HAS_PIL`` gate in operators/multimodal.py.

Format notes:
- BMP: ``BM`` magic, BITMAPFILEHEADER(14) + BITMAPINFOHEADER(40),
  24-bit, uncompressed (BI_RGB), BGR byte order, rows padded to 4
  bytes, bottom-up unless height < 0.
- WAV: RIFF/WAVE container walked chunk-by-chunk (not fixed-offset:
  real files carry LIST/fact chunks); PCM (format 1), 16-bit.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a 24-bit uncompressed BMP."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("need (H, W, 3) uint8 RGB")
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) // 4 * 4
    img_size = row_size * h
    file_header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    bgr = pixels[:, :, ::-1]
    pad = b"\x00" * (row_size - w * 3)
    # bottom-up row order, as stock encoders write
    body = b"".join(bgr[y].tobytes() + pad for y in range(h - 1, -1, -1))
    return file_header + info_header + body


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to an (H, W, 3) uint8 RGB array."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack_from("<I", data, 10)
    _, w, h, _, bpp = struct.unpack_from("<IiiHH", data, 14)
    (compression,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or compression != 0:
        raise ValueError("only 24-bit uncompressed BMP supported")
    top_down = h < 0
    h = abs(h)
    row_size = (w * 3 + 3) // 4 * 4
    arr = np.frombuffer(data, np.uint8, count=row_size * h, offset=offset)
    arr = arr.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    if not top_down:
        arr = arr[::-1]
    return np.ascontiguousarray(arr)


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode a 1-D int16 array as 16-bit mono PCM WAV."""
    s = np.asarray(samples).astype("<i2")
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM-16 WAV; returns (samples int16 [n] or [n, ch], rate)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            raw = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError("only 16-bit PCM supported")
    samples = np.frombuffer(raw, dtype="<i2")
    if n_ch > 1:
        samples = samples.reshape(-1, n_ch)
    return samples, rate


def mean_pool(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Exact mean-pool resize for evenly divisible shapes (the fixed
    decode→resize step; general resampling needs a real image lib)."""
    h, w, c = img.shape
    if h % out_h or w % out_w:
        raise ValueError("mean_pool requires divisible shapes")
    return (
        img.reshape(out_h, h // out_h, out_w, w // out_w, c)
        .mean(axis=(1, 3))
        .astype(np.float64)
    )


# ---------------------------------------------------------------------------
# AVI (uncompressed DIB frames) — the video modality's real container
# ---------------------------------------------------------------------------


def _riff_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) walking a RIFF chunk run."""
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", data, pos + 4)
        yield cid, pos + 8, sz
        pos += 8 + sz + (sz & 1)  # word-aligned


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """Encode (N, H, W, 3) uint8 RGB frames as an uncompressed AVI
    ('DIB ' video stream: raw BGR bottom-up rows padded to 4 bytes —
    the same pixel layout as BMP, one '00db' chunk per frame). Stock
    players (ffplay/VLC) open the output."""
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError("need (N, H, W, 3) uint8 RGB")
    n, h, w, _ = frames.shape
    row_size = (w * 3 + 3) // 4 * 4
    frame_size = row_size * h
    pad = b"\x00" * (row_size - w * 3)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    def list_chunk(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, frame_size * fps, 0, 0x10, n, 0, 1, frame_size, w, h,
        0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIiI", 0, 0, 0, 0, 1, fps, 0, n,
                                        frame_size, -1, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0)
    hdrl = list_chunk(
        b"hdrl", chunk(b"avih", avih) + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    )
    movi_body = b"".join(
        chunk(
            b"00db",
            b"".join(f[y, :, ::-1].tobytes() + pad for y in range(h - 1, -1, -1)),
        )
        for f in frames
    )
    movi = list_chunk(b"movi", movi_body)
    # idx1: avih advertises AVIF_HASINDEX (0x10), so actually write the
    # index (strict players may balk at an advertised-but-missing one).
    # Entry offsets point at each frame chunk's fourcc, relative to the
    # 'movi' fourcc; every frame is a keyframe (AVIIF_KEYFRAME = 0x10).
    chunk_stride = 8 + frame_size  # frame_size is 4-aligned, no pad byte
    idx1 = chunk(
        b"idx1",
        b"".join(
            struct.pack("<4sIII", b"00db", 0x10, 4 + i * chunk_stride, frame_size)
            for i in range(n)
        ),
    )
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi(data: bytes) -> np.ndarray:
    """Decode an uncompressed-DIB AVI to (N, H, W, 3) uint8 RGB frames
    (nested RIFF walk: hdrl→strl→strf for dimensions, movi for the
    '00db'/'00dc' frame chunks)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    w = h = None
    top_down = False
    frames: list[np.ndarray] = []

    def walk(pos: int, end: int) -> None:
        nonlocal w, h, top_down
        for cid, body, sz in _riff_chunks(data, pos, end):
            if cid == b"LIST":
                walk(body + 4, body + sz)
            elif cid == b"strf":
                _, w_, h_, _, bpp = struct.unpack_from("<IiiHH", data, body)
                (comp,) = struct.unpack_from("<I", data, body + 16)
                if bpp != 24 or comp != 0:
                    raise ValueError("only 24-bit uncompressed AVI supported")
                # DIB convention: negative biHeight = top-down rows —
                # flipping those too would mirror the frames vertically.
                w, h, top_down = w_, abs(h_), h_ < 0
            elif cid in (b"00db", b"00dc"):
                if w is None:
                    raise ValueError("frame chunk before strf header")
                row_size = (w * 3 + 3) // 4 * 4
                arr = np.frombuffer(data, np.uint8, count=row_size * h, offset=body)
                arr = arr.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
                frames.append(np.ascontiguousarray(arr if top_down else arr[::-1]))

    walk(12, 8 + struct.unpack_from("<I", data, 4)[0])
    return np.stack(frames) if frames else np.zeros((0, 0, 0, 3), np.uint8)
