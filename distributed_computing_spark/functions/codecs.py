"""Pure-numpy codecs: BMP, WAV, AVI (uncompressed) and PNG (DEFLATE
via stdlib zlib).

These are REAL codecs for real formats — any stock image viewer opens
the BMP/PNG output, any audio player the WAV, any video player the
AVI — implemented with struct+numpy+zlib so the decode path has no
PIL/ffmpeg dependency (both absent in this container). They make the
multimodal decode pipeline end-to-end real. Baseline JPEG lives in the
sibling functions/jpeg.py (round 5, pure-numpy DCT); only MP3's
psychoacoustic MDCT still genuinely needs a library (the ``_HAS_PIL``
gate in operators/multimodal.py).

Format notes:
- BMP: ``BM`` magic, BITMAPFILEHEADER(14) + BITMAPINFOHEADER(40),
  24-bit, uncompressed (BI_RGB), BGR byte order, rows padded to 4
  bytes, bottom-up unless height < 0.
- WAV: RIFF/WAVE container walked chunk-by-chunk (not fixed-offset:
  real files carry LIST/fact chunks); PCM (format 1), 16-bit.
- PNG: signature + length/type/data/CRC chunk walk, IDAT concat +
  zlib inflate, per-scanline unfilter of all five filter types
  (None/Sub/Up/Average/Paeth); 8-bit gray/RGB/RGBA, non-interlaced.
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


# ---------------------------------------------------------------------------
# PNG (stdlib-zlib DEFLATE) — the compressed image format needs no PIL
# ---------------------------------------------------------------------------
#
# PNG's only hard dependency is DEFLATE, which Python ships (zlib), so a
# full-fidelity 8-bit codec is implementable here: chunk walk (length/
# type/data/CRC), IDAT inflate, and per-scanline unfiltering of all five
# filter types (None/Sub/Up/Average/Paeth). JPEG/MP3 stay env-blocked —
# those genuinely need a DCT/MDCT codec library.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> channels (8-bit depth only; palette would need PLTE)
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (left, up, up-left)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(pixels: np.ndarray, filter_type: int = 2) -> bytes:
    """Encode (H, W), (H, W, 3) or (H, W, 4) uint8 as a real PNG.

    ``filter_type`` applies to every scanline after the first (the
    first is always filter 0 — no prior row for Up/Average/Paeth) so
    the decoder's unfilter path is exercised by our own files, not just
    foreign ones. Stock viewers open the output (CRCs included).
    """
    import zlib

    if pixels.dtype != np.uint8 or pixels.ndim not in (2, 3):
        raise ValueError("need (H, W[, C]) uint8")
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, ch = pixels.shape
    color_type = {1: 0, 3: 2, 4: 6}.get(ch)
    if color_type is None:
        raise ValueError("channels must be 1, 3, or 4")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError("filter_type must be 0..4")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    px = pixels.astype(np.int16)
    raw = bytearray()
    for y in range(h):
        ft = 0 if y == 0 else filter_type
        row = px[y].reshape(-1)
        if ft == 0:
            filt = row
        elif ft == 1:  # Sub: left neighbor (same channel)
            left = np.concatenate([np.zeros(ch, np.int16), row[:-ch]])
            filt = row - left
        elif ft == 2:  # Up
            filt = row - px[y - 1].reshape(-1)
        elif ft == 3:  # Average
            left = np.concatenate([np.zeros(ch, np.int16), row[:-ch]])
            filt = row - (left + px[y - 1].reshape(-1)) // 2
        else:  # Paeth — vectorized: the ENCODE predictor reads only
            # ORIGINAL neighbor bytes (unlike decode, whose left
            # neighbor is the reconstructed value), so the whole row
            # computes in numpy (was a per-byte Python loop; the blob
            # generators emit thousands of these per Arrow batch)
            up = px[y - 1].reshape(-1)
            a = np.concatenate([np.zeros(ch, np.int16), row[:-ch]])
            c = np.concatenate([np.zeros(ch, np.int16), up[:-ch]])
            p = a + up - c
            pa, pb, pc = np.abs(p - a), np.abs(p - up), np.abs(p - c)
            pred = np.where(
                (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, up, c)
            )
            filt = row - pred
        raw.append(ft)
        raw += (filt % 256).astype(np.uint8).tobytes()
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG (gray / RGB / RGBA) to an
    (H, W, C) uint8 array. The container walk (chunk CRCs, IHDR
    validation, IDAT concat + inflate) is decode_png_headers — one
    parser, not two copies that can drift (ADVICE r5); this function
    keeps only the scalar per-scanline unfilter loop."""
    h, w, ch, raw = decode_png_headers(data)
    stride = w * ch
    out = np.zeros((h, stride), np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int16)
        prior = out[y - 1].astype(np.int16) if y > 0 else np.zeros(stride, np.int16)
        if ft == 0:
            rec = line
        elif ft == 2:  # Up (vectorized)
            rec = line + prior
        elif ft in (1, 3, 4):  # Sub/Average/Paeth: left-dependent scan
            rec = np.empty(stride, np.int16)
            for i in range(stride):
                a = int(rec[i - ch]) if i >= ch else 0
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + int(prior[i])) // 2
                else:
                    c = int(prior[i - ch]) if i >= ch else 0
                    pred = _paeth(a, int(prior[i]), c)
                # reduce IN the loop: the raw (mod-256) value is the
                # left neighbor feeding the next pixel's prediction
                rec[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad filter type {ft}")
        out[y] = (rec % 256).astype(np.uint8)
    return out.reshape(h, w, ch)


def _paeth_vec(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (same tie-break order as _paeth)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def unfilter_scanlines_batch(raws: list[bytes], h: int, w: int, ch: int) -> np.ndarray:
    """Batched PNG scanline reconstruction: N same-shape inflated IDAT
    payloads → (N, H, W, C) uint8.

    The Sub/Average/Paeth recurrences are sequential along x (each
    pixel's LEFT neighbor is the reconstructed value), so a per-image
    decode pays H·stride Python steps per image. Across an Arrow batch
    the images are independent — running the same recurrence once with
    N-vector numpy ops turns H·stride·N scalar steps into H·stride
    vector steps (the decode-side analog of the fused-Arrow-pass wins;
    per-image filter types may differ per row, handled with masks).
    Bit-identical to decode_png's scalar path (tested per filter type).
    """
    stride = w * ch
    n = len(raws)
    arr = np.frombuffer(b"".join(raws), np.uint8).reshape(n, h, stride + 1)
    out = np.zeros((n, h, stride), np.uint8)
    zero_col = np.zeros(n, np.int16)
    for y in range(h):
        ft = arr[:, y, 0]
        if (ft > 4).any():
            raise ValueError(f"bad filter type {int(ft.max())}")
        line = arr[:, y, 1:].astype(np.int16)
        prior = out[:, y - 1].astype(np.int16) if y > 0 else np.zeros(
            (n, stride), np.int16
        )
        rec = np.empty((n, stride), np.int16)
        easy = (ft == 0) | (ft == 2)
        if easy.any():
            rec[easy] = np.where(
                (ft[easy] == 2)[:, None], line[easy] + prior[easy], line[easy]
            ) & 0xFF
        hard = ~easy
        if hard.any():
            ln, pr, fh = line[hard], prior[hard], ft[hard][:, None]
            rh = np.empty_like(ln)
            for i in range(stride):
                a = rh[:, i - ch] if i >= ch else zero_col[: len(ln)]
                b = pr[:, i]
                c = pr[:, i - ch] if i >= ch else zero_col[: len(ln)]
                pred = np.where(
                    fh[:, 0] == 1,
                    a,
                    np.where(fh[:, 0] == 3, (a + b) // 2, _paeth_vec(a, b, c)),
                )
                rh[:, i] = (ln[:, i] + pred) & 0xFF
            rec[hard] = rh
        out[:, y] = rec.astype(np.uint8)
    return out.reshape(n, h, w, ch)


def decode_png_headers(data: bytes) -> tuple[int, int, int, bytes]:
    """Chunk-walk a PNG and return (h, w, channels, inflated_raw) — the
    shared front half of decode_png, exposed so batch consumers can
    group same-shape images for unfilter_scanlines_batch."""
    import zlib

    if len(data) < 8 or data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w, h, ch = 8, None, None, None
    idat = bytearray()
    while pos + 8 <= len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        crc_off = pos + 8 + ln
        if crc_off + 4 > len(data):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", data, crc_off)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
                raise ValueError("only 8-bit, method-0, non-interlaced PNG")
            ch = _PNG_CHANNELS.get(color_type)
            if ch is None:
                raise ValueError(f"unsupported color type {color_type}")
        elif ctype == b"IDAT":
            if w is None:
                raise ValueError("IDAT before IHDR")
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (w * ch + 1):
        raise ValueError("bad scanline payload size")
    return h, w, ch, raw


# ---------------------------------------------------------------------------
# GIF (GIF87a, global color table, single image, no interlace)
# ---------------------------------------------------------------------------
# The LZW compression family — distinct from DEFLATE (PNG) and DCT
# (JPEG): variable-width codes 3..12 bits packed LSB-first, a growing
# string table with clear/EOI control codes, and the KwKwK corner case.
# Pure stdlib; scope mirrors the other codecs (encoder: GCT <= 256
# colors, one image; decoder: skips 0x21 extension blocks, rejects
# interlace/local color tables with a targeted ValueError).


def _gif_lzw_encode(indices, min_code: int) -> bytes:
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    table = {(i,): i for i in range(1 << min_code)}
    next_code = eoi + 1
    width = min_code + 1
    out = bytearray()
    acc = n_acc = 0

    def emit(code: int, w: int) -> None:
        nonlocal acc, n_acc
        acc |= code << n_acc
        n_acc += w
        while n_acc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_acc -= 8

    emit(clear, width)
    seq: tuple = ()
    for v in map(int, indices):
        cand = seq + (v,)
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == 1 << width and width < 12:
            width += 1
        elif next_code > 4095:
            emit(clear, width)
            table = {(i,): i for i in range(1 << min_code)}
            next_code = eoi + 1
            width = min_code + 1
        seq = (v,)
    if seq:
        emit(table[seq], width)
    emit(eoi, width)
    if n_acc:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_lzw_decode(data: bytes, min_code: int, n_pixels: int) -> list[int]:
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    pos = 0

    def read(w: int) -> int:
        nonlocal pos
        v = 0
        for i in range(w):
            byte, bit = divmod(pos, 8)
            if byte >= len(data):
                raise ValueError("GIF: LZW stream truncated")
            v |= ((data[byte] >> bit) & 1) << i
            pos += 1
        return v

    table: list[tuple] = []

    def reset() -> tuple[int, int]:
        nonlocal table
        table = [(i,) for i in range(1 << min_code)] + [(), ()]
        return min_code + 1, len(table)

    width, next_code = reset()
    out: list[int] = []
    prev: tuple | None = None
    while len(out) < n_pixels:
        code = read(width)
        if code == clear:
            width, next_code = reset()
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and code not in (clear, eoi):
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + (prev[0],)  # KwKwK
        else:
            raise ValueError(f"GIF: bad LZW code {code}")
        out.extend(entry)
        if prev is not None:
            table.append(prev + (entry[0],))
            next_code += 1
            if next_code == 1 << width and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("GIF: pixel data ended early")
    return out[:n_pixels]


def encode_gif(pixels) -> bytes:
    """H×W×3 uint8 → GIF87a bytes (global color table built from the
    image's distinct colors, sorted for determinism; <= 256 or raise)."""
    import struct

    px = np.asarray(pixels, np.uint8)
    h, w, _ = px.shape
    flat = px.reshape(-1, 3)
    colors = sorted({tuple(int(x) for x in c) for c in flat})
    if len(colors) > 256:
        raise ValueError("GIF encoder: more than 256 distinct colors")
    p = max(2, (max(len(colors) - 1, 1)).bit_length())  # 2^p GCT entries
    cmap = {c: i for i, c in enumerate(colors)}
    idx = [cmap[tuple(int(x) for x in c)] for c in flat]
    out = bytearray(b"GIF87a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | ((p - 1) & 0x07))  # GCT flag + size
    out += b"\x00\x00"  # bg index, aspect
    for i in range(1 << p):
        out += bytes(colors[i]) if i < len(colors) else b"\x00\x00\x00"
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out.append(p)  # LZW min code size
    lzw = _gif_lzw_encode(idx, p)
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(data: bytes):
    """GIF87a/89a bytes → H×W×3 uint8 (global color table, first image;
    extension blocks skipped; interlace/local tables rejected)."""
    import struct

    if len(data) < 13:
        raise ValueError("GIF: truncated header")
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("GIF: bad signature")
    w, h = struct.unpack_from("<HH", data, 6)
    packed, _bg, _aspect = data[10], data[11], data[12]
    off = 13
    if not packed & 0x80:
        raise ValueError("GIF: no global color table")
    n_gct = 2 << (packed & 0x07)
    if off + n_gct * 3 > len(data):
        raise ValueError("GIF: truncated color table")
    gct = np.frombuffer(data, np.uint8, n_gct * 3, off).reshape(-1, 3)
    off += n_gct * 3
    while True:
        if off >= len(data):
            raise ValueError("GIF: no image descriptor")
        b0 = data[off]
        off += 1
        if b0 == 0x21:  # extension: label + sub-blocks
            off += 1
            while True:
                if off >= len(data):
                    raise ValueError("GIF: truncated extension block")
                if data[off] == 0:
                    break
                off += 1 + data[off]
            off += 1
        elif b0 == 0x2C:
            break
        elif b0 == 0x3B:
            raise ValueError("GIF: trailer before image data")
        else:
            raise ValueError(f"GIF: unexpected block 0x{b0:02x}")
    if off + 9 > len(data):
        raise ValueError("GIF: truncated image descriptor")
    left, top, iw, ih = struct.unpack_from("<HHHH", data, off)
    ipacked = data[off + 8]
    off += 9
    if ipacked & 0x80:
        raise ValueError("GIF: local color tables not supported")
    if ipacked & 0x40:
        raise ValueError("GIF: interlace not supported")
    if (left, top, iw, ih) != (0, 0, w, h):
        raise ValueError("GIF: sub-rectangle images not supported")
    if off >= len(data):
        raise ValueError("GIF: truncated before LZW min code size")
    min_code = data[off]
    off += 1
    lzw = bytearray()
    while True:
        if off >= len(data):
            raise ValueError("GIF: truncated LZW data block")
        n = data[off]
        off += 1
        if n == 0:
            break
        if off + n > len(data):
            raise ValueError("GIF: truncated LZW data block")
        lzw += data[off : off + n]
        off += n
    idx = _gif_lzw_decode(bytes(lzw), min_code, w * h)
    arr = np.array(idx, np.int32)
    if arr.max(initial=0) >= len(gct):
        raise ValueError("GIF: palette index out of range")
    return gct[arr].reshape(h, w, 3)
