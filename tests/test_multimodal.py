"""Multimodal tests: plumbing contracts AND real codecs.

The GENERIC-format kernels are deterministic fakes (no PIL/ffmpeg in
the container) — those tests pin the *plumbing* contract: schema
stability, modality filtering staying JVM-side, Arrow batch iteration,
composition with the similarity operators. The REAL codecs need no
library and are tested as codecs: BMP/WAV/AVI/PNG (functions/codecs.py)
and baseline JPEG (functions/jpeg.py) — roundtrips, container
well-formedness, malformed-input ValueError contracts, closed-form
value gates, and the 4:2:0 subsampling decode path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_computing_spark.operators.multimodal import (
    FEATURE_DIM,
    blob_stats,
    blobs_from_documents,
    decode_images,
    extract_features,
    make_blob_table,
    sample_frames,
)
from distributed_computing_spark.operators.similarity import cosine_topk


def test_blob_stats_schema_and_hashes(spark):
    blobs = make_blob_table(spark, 30)
    stats = blob_stats(blobs)
    assert stats.columns == ["blob_id", "modality", "n_bytes", "sha256", "mime"]
    rows = stats.collect()
    assert all(r["n_bytes"] == 128 for r in rows)
    assert len({r["sha256"] for r in rows}) == 30  # distinct blobs


def test_decode_images_only_images_and_deterministic(spark):
    blobs = make_blob_table(spark, 30)
    feats = decode_images(blobs)
    rows = feats.collect()
    n_images = blobs.where(F.col("modality") == "image").count()
    assert len(rows) == n_images
    assert feats.schema.simpleString() == (
        "struct<blob_id:bigint,width:int,height:int,mean_r:double,mean_g:double,mean_b:double>"
    )
    again = {r["blob_id"]: (r["mean_r"], r["mean_g"], r["mean_b"]) for r in decode_images(blobs).collect()}
    first = {r["blob_id"]: (r["mean_r"], r["mean_g"], r["mean_b"]) for r in rows}
    assert first == again
    assert all(0.0 <= v <= 255.0 for t in first.values() for v in t)


def test_sample_frames_even_spacing(spark):
    blobs = make_blob_table(spark, 30)
    frames = sample_frames(blobs, k=4)
    per_blob = frames.groupBy("blob_id").count().collect()
    assert all(r["count"] == 4 for r in per_blob)
    one = sorted(
        r["frame_ts_ms"]
        for r in frames.where(F.col("blob_id") == 2).collect()
    )
    dur = blobs.where(F.col("blob_id") == 2).select("meta.duration_ms").collect()[0][0]
    assert one == [i * dur // 4 for i in range(4)]


def test_blobs_from_documents_adapter(spark, sf_dir):
    """The documents→blob adapter: payload bytes are the text's UTF-8
    encoding, metadata is a pure function of doc_id."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    blobs = blobs_from_documents(docs)
    assert blobs.count() == docs.count()
    r = blobs.join(docs, blobs.blob_id == docs.doc_id).select(
        "doc_id", "text", "modality", "data", "meta"
    ).first()
    assert bytes(r["data"]) == r["text"].encode("utf-8")
    assert r["modality"] == ["image", "audio", "video"][r["doc_id"] % 3]
    if r["modality"] == "audio":
        assert r["meta"]["width"] is None
    else:
        assert r["meta"]["width"] == 64 + r["doc_id"] % 16


def test_extract_features_compose_with_ann(spark):
    """multimodal → embedding → cosine top-k composes end-to-end."""
    blobs = make_blob_table(spark, 24)
    emb = extract_features(blobs)
    assert emb.schema.simpleString() == "struct<blob_id:bigint,embedding:array<float>>"
    sizes = emb.select(F.size("embedding").alias("s")).distinct().collect()
    assert [r["s"] for r in sizes] == [FEATURE_DIM]
    q = emb.where(F.col("blob_id") < 3)
    topk = cosine_topk(emb, q, k=3, id_col="blob_id", vec_col="embedding")
    assert topk.count() == 9


def test_decode_audio_only_audio_and_deterministic(spark):
    from distributed_computing_spark.operators.multimodal import decode_audio

    blobs = make_blob_table(spark, 30)
    stats = decode_audio(blobs)
    rows = stats.collect()
    assert len(rows) == blobs.where(F.col("modality") == "audio").count()
    assert stats.schema.simpleString() == (
        "struct<blob_id:bigint,n_samples:bigint,rms:double,peak:double>"
    )
    again = {r["blob_id"]: (r["n_samples"], r["rms"]) for r in decode_audio(blobs).collect()}
    assert again == {r["blob_id"]: (r["n_samples"], r["rms"]) for r in rows}
    for r in rows:
        assert r["n_samples"] >= 1 and 0 <= r["rms"] <= r["peak"] <= 32768


def test_generic_decode_dispatches_to_real_codecs(spark):
    """VERDICT r7 item 4: a PNG/BMP/GIF/JPEG blob through the GENERIC
    decode_images path (no PIL in this container) must return the REAL
    decode — magic-byte sniff → functions/codecs.py / jpeg.py — with
    width/height taken from the decoded image, while unknown bytes and
    magic false positives (text starting with 'BM') keep the
    deterministic fake sized from the meta struct."""
    import numpy as np

    from distributed_computing_spark.functions.codecs import (
        encode_bmp,
        encode_gif,
        encode_png,
    )
    from distributed_computing_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )
    from distributed_computing_spark.operators.multimodal import (
        BLOB_SCHEMA,
        _fake_decode_rgb,
    )

    solid = np.zeros((16, 16, 3), np.uint8)
    solid[..., 0], solid[..., 1], solid[..., 2] = 40, 90, 200
    jpg = encode_jpeg(solid, quality=90)
    # expected JPEG means from the direct decoder (lossy but exact here)
    jexp = decode_jpeg(jpg).reshape(-1, 3).mean(axis=0)
    payloads = {
        0: encode_png(solid),
        1: encode_bmp(solid),
        2: encode_gif(solid),
        3: jpg,
        4: b"plain text, no container magic at all" * 4,
        5: b"BM" + b"this only looks like a bitmap header" * 3,
    }
    meta = {"mime": "image/png", "width": 8, "height": 8, "duration_ms": None}
    blobs = spark.createDataFrame(
        [(i, "image", payloads[i], meta) for i in sorted(payloads)],
        BLOB_SCHEMA,
    )
    got = {
        r["blob_id"]: r
        for r in decode_images(blobs, out_w=4, out_h=4).collect()
    }
    # real containers: decoded 16x16, solid-color means exact
    for i in (0, 1, 2):
        assert (got[i]["width"], got[i]["height"]) == (16, 16)
        assert (
            got[i]["mean_r"],
            got[i]["mean_g"],
            got[i]["mean_b"],
        ) == (40.0, 90.0, 200.0)
    assert (got[3]["width"], got[3]["height"]) == (16, 16)
    assert abs(got[3]["mean_r"] - jexp[0]) < 1e-9
    assert abs(got[3]["mean_g"] - jexp[1]) < 1e-9
    assert abs(got[3]["mean_b"] - jexp[2]) < 1e-9
    # unknown + malformed-BM: the fake, sized from meta (8x8)
    for i in (4, 5):
        assert (got[i]["width"], got[i]["height"]) == (8, 8)
        fake = _fake_decode_rgb(payloads[i], 8, 8).astype(np.float64)
        assert abs(got[i]["mean_r"] - fake[..., 0].mean()) < 1e-9


def test_generic_audio_decode_dispatches_to_real_codecs(spark):
    """WAV and MP3-silence blobs through the GENERIC decode_audio path
    return the REAL waveform stats; unknown bytes keep the fake."""
    import numpy as np

    from distributed_computing_spark.functions.codecs import encode_wav
    from distributed_computing_spark.functions.mp3 import (
        SAMPLES_PER_FRAME,
        encode_mp3_silence,
    )
    from distributed_computing_spark.operators.multimodal import (
        BLOB_SCHEMA,
        decode_audio,
    )

    samples = (np.arange(256, dtype=np.int64) * 101 % 4001 - 2000).astype(
        np.int16
    )
    payloads = {
        0: encode_wav(samples, 8000),
        1: encode_mp3_silence(3),
        2: b"not an audio container, just bytes" * 5,
    }
    meta = {"mime": "audio/wav", "width": None, "height": None,
            "duration_ms": 50}
    blobs = spark.createDataFrame(
        [(i, "audio", payloads[i], meta) for i in sorted(payloads)],
        BLOB_SCHEMA,
    )
    got = {r["blob_id"]: r for r in decode_audio(blobs).collect()}
    w = samples.astype(np.float64)
    assert got[0]["n_samples"] == 256
    assert abs(got[0]["rms"] - float(np.sqrt((w**2).mean()))) < 1e-9
    assert got[0]["peak"] == float(np.abs(w).max())
    # MP3 silence: exact zero PCM across 3 frames
    assert got[1]["n_samples"] == 3 * SAMPLES_PER_FRAME
    assert got[1]["rms"] == 0.0 and got[1]["peak"] == 0.0
    # unknown: deterministic fake sized from meta duration (50ms@8kHz)
    assert got[2]["n_samples"] == 400


# ---------------------------------------------------------------------------
# REAL pure-numpy codecs (BMP / WAV)
# ---------------------------------------------------------------------------


def test_bmp_roundtrip_including_row_padding():
    import numpy as np

    from distributed_computing_spark.functions.codecs import decode_bmp, encode_bmp

    rng = np.random.default_rng(3)
    for h, w in [(16, 16), (5, 7), (1, 1), (3, 2)]:  # odd widths → padded rows
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        back = decode_bmp(encode_bmp(img))
        assert back.shape == (h, w, 3)
        assert (back == img).all()


def test_bmp_decoder_handles_top_down_files():
    import struct

    import numpy as np

    from distributed_computing_spark.functions.codecs import decode_bmp, encode_bmp

    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    data = bytearray(encode_bmp(img))
    # flip to top-down: negative height + rows in top-down order
    struct.pack_into("<i", data, 22, -4)
    row = (4 * 3 + 3) // 4 * 4
    body = bytes(data[54:])
    rows = [body[i * row : (i + 1) * row] for i in range(4)]
    data[54:] = b"".join(reversed(rows))
    assert (decode_bmp(bytes(data)) == img).all()


def test_wav_roundtrip_and_chunk_walk():
    import struct

    import numpy as np

    from distributed_computing_spark.functions.codecs import decode_wav, encode_wav

    s = np.array([-32768, -1, 0, 1, 32767, 123] * 10, dtype=np.int64)
    data = encode_wav(s, sample_rate=16000)
    back, rate = decode_wav(data)
    assert rate == 16000 and (back.astype(np.int64) == s).all()
    # insert a LIST chunk between fmt and data — real files have these;
    # a fixed-offset parser would break
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    patched = data[:fmt_end] + extra + data[fmt_end:]
    back2, _ = decode_wav(patched)
    assert (back2.astype(np.int64) == s).all()


def test_mean_pool_gradient_exact():
    import numpy as np

    from distributed_computing_spark.functions.codecs import mean_pool

    img = np.zeros((4, 4, 3), np.uint8)
    img[..., 0] = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = mean_pool(img, 2, 2)
    # top-left 2x2 block of the ramp: (0+1+4+5)/4 = 2.5
    assert out[0, 0, 0] == 2.5 and out.shape == (2, 2, 3)


def test_real_codec_blob_pipeline(spark, sf_dir):
    """End-to-end through Spark: genuine BMP/WAV payloads survive the
    BinaryType column and decode to the closed-form expectations."""
    from distributed_computing_spark.operators.multimodal import (
        bmp_wav_blobs,
        decode_audio_wav,
        decode_images_bmp,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    blobs = bmp_wav_blobs(docs)
    for r in decode_images_bmp(blobs).collect():
        i = r["blob_id"]
        assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (
            (i * 7) % 256,
            (i * 13) % 256,
            (i * 29) % 256,
        )
    for r in decode_audio_wav(blobs).collect():
        assert r["n_samples"] == 256 and r["sample_rate"] == 8000


def test_avi_roundtrip_and_frame_sampling():
    import numpy as np

    from distributed_computing_spark.functions.codecs import decode_avi, encode_avi

    rng = np.random.default_rng(5)
    for n, h, w in [(4, 8, 8), (2, 5, 7), (1, 1, 1)]:  # odd widths → padded rows
        fr = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
        back = decode_avi(encode_avi(fr))
        assert back.shape == fr.shape and (back == fr).all()


def test_avi_spark_frame_means(spark, sf_dir):
    from distributed_computing_spark.operators.multimodal import (
        avi_blobs,
        sample_frames_avi,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    rows = sample_frames_avi(avi_blobs(docs), stride=2).collect()
    assert rows and {r["frame_idx"] for r in rows} == {0, 2}
    for r in rows:
        i, f = r["blob_id"], r["frame_idx"]
        assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (
            (i * 7 + 3 * f) % 256,
            (i * 13 + 5 * f) % 256,
            (i * 29 + 7 * f) % 256,
        )


def test_avi_honors_top_down_height_sign():
    """round-4 ADVICE: negative strf biHeight marks top-down row order —
    the decoder must not flip those frames (it would mirror them)."""
    import struct

    import numpy as np

    from distributed_computing_spark.functions.codecs import decode_avi, encode_avi

    frames = np.zeros((2, 4, 4, 3), np.uint8)
    frames[:, 0, :, 0] = 255  # distinctive top row
    data = encode_avi(frames)
    # patch strf biHeight to -h AND leave the (bottom-up-encoded) rows
    # alone: the decoder must now read them as top-down, i.e. flipped.
    i = data.index(b"strf") + 8  # chunk header: fourcc + size
    h = struct.unpack_from("<i", data, i + 8)[0]
    patched = bytearray(data)
    struct.pack_into("<i", patched, i + 8, -h)
    normal = decode_avi(data)
    top_down = decode_avi(bytes(patched))
    assert np.array_equal(normal, frames)
    assert np.array_equal(top_down, frames[:, ::-1])


def test_avi_idx1_index_present_and_correct():
    """round-4 ADVICE: avih advertises AVIF_HASINDEX, so the file must
    carry an idx1 chunk whose entries point at each frame chunk
    (offsets relative to the 'movi' fourcc)."""
    import struct

    import numpy as np

    from distributed_computing_spark.functions.codecs import encode_avi

    n, h, w = 3, 4, 4
    frames = np.arange(n * h * w * 3, dtype=np.uint8).reshape(n, h, w, 3)
    data = encode_avi(frames)
    i = data.index(b"idx1")
    (sz,) = struct.unpack_from("<I", data, i + 4)
    assert sz == 16 * n
    movi = data.index(b"movi")
    for e in range(n):
        cid, flags, off, size = struct.unpack_from("<4sIII", data, i + 8 + 16 * e)
        assert cid == b"00db" and flags == 0x10
        assert data[movi + off : movi + off + 4] == b"00db"
        assert size == ((w * 3 + 3) // 4 * 4) * h


def test_png_roundtrip_all_filter_types():
    """PNG codec (round 4, stdlib zlib only): encode/decode must be the
    identity for every scanline filter type and for gray/RGB/RGBA."""
    import numpy as np

    from distributed_computing_spark.functions.codecs import decode_png, encode_png

    rng = np.random.RandomState(7)
    for shape in [(5, 7, 3), (4, 4, 4), (6, 3), (1, 1, 3)]:
        px = rng.randint(0, 256, size=shape).astype(np.uint8)
        want = px if px.ndim == 3 else px[:, :, None]
        for ft in range(5):
            assert np.array_equal(decode_png(encode_png(px, filter_type=ft)), want)


def test_png_paeth_predictor_reference_cases():
    """Paeth predictor per the PNG spec: nearest of (left, up, up-left)
    to p = a + b - c, ties resolved a then b then c."""
    from distributed_computing_spark.functions.codecs import _paeth

    assert _paeth(10, 20, 15) == 15   # p=15: c is exact
    assert _paeth(100, 20, 15) == 100  # p=105: a closest
    assert _paeth(5, 200, 100) == 100  # p=105: c closest
    assert _paeth(7, 7, 7) == 7        # tie -> a
    assert _paeth(0, 0, 0) == 0


def test_png_container_is_wellformed():
    """The emitted bytes are a real PNG container: signature, IHDR
    first, CRC-valid chunks, IEND last — what any stock decoder checks
    before touching pixel data."""
    import struct
    import zlib

    import numpy as np

    from distributed_computing_spark.functions.codecs import encode_png

    data = encode_png(np.zeros((3, 5, 3), np.uint8))
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, types = 8, []
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + ln)
        assert crc == (zlib.crc32(ctype + body) & 0xFFFFFFFF)
        types.append(ctype)
        pos += 12 + ln
    assert types[0] == b"IHDR" and types[-1] == b"IEND" and b"IDAT" in types
    w, h, depth, ct, *_ = struct.unpack(">IIBBBBB", data[16:29])
    assert (w, h, depth, ct) == (5, 3, 8, 2)


def test_png_spark_decode_means(spark, sf_dir):
    """decode_images_png over png_blobs: per-channel means equal the
    planted two-band closed form for every doc."""
    from distributed_computing_spark.operators.multimodal import (
        decode_images_png,
        png_blobs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(24)
    rows = decode_images_png(png_blobs(docs)).collect()
    assert len(rows) == 24
    for r in rows:
        i = r["blob_id"]
        assert (r["width"], r["height"]) == (16, 16)
        assert r["mean_r"] == ((i * 7) % 256 + (i * 11) % 256) / 2
        assert r["mean_g"] == ((i * 13) % 256 + (i * 17) % 256) / 2
        assert r["mean_b"] == ((i * 29) % 256 + (i * 23) % 256) / 2


def test_png_decode_malformed_follows_valueerror_contract():
    """ADVICE r5: malformed containers fail with ValueError (the codec's
    documented contract), never NameError/IndexError — IDAT before IHDR,
    corrupted chunk CRC, and truncated chunks all included."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from distributed_computing_spark.functions.codecs import decode_png, encode_png

    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    # IDAT before IHDR: previously referenced h/ch before assignment.
    bad = sig + chunk(b"IDAT", zlib.compress(b"\x00\x00")) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="IDAT before IHDR"):
        decode_png(bad)

    good = encode_png(np.arange(48, dtype=np.uint8).reshape(4, 4, 3))
    # flip one byte inside the first chunk body -> CRC mismatch
    corrupted = bytearray(good)
    corrupted[20] ^= 0xFF
    with pytest.raises(ValueError, match="bad CRC"):
        decode_png(bytes(corrupted))
    # truncate inside the final chunk's CRC -> truncated, not IndexError
    with pytest.raises(ValueError, match="truncated"):
        decode_png(good[:-1])


def test_jpeg_roundtrip_quality_and_determinism():
    """Baseline JPEG codec (round 5, pure numpy): lossy but faithful —
    PSNR above floor on random and smooth content, deterministic bytes,
    grayscale path, odd (non-multiple-of-8) dimensions."""
    import numpy as np

    from distributed_computing_spark.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(11)

    def psnr(a, b):
        mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
        return 10 * np.log10(255**2 / max(mse, 1e-12))

    px = rng.randint(0, 256, (24, 31, 3)).astype(np.uint8)
    data = encode_jpeg(px, quality=90)
    assert data == encode_jpeg(px, quality=90)  # deterministic
    out = decode_jpeg(data)
    assert out.shape == (24, 31, 3)
    assert psnr(px, out) > 25  # random noise is the worst case for DCT

    xx, yy = np.meshgrid(np.arange(33), np.arange(17))
    smooth = np.stack(
        [(xx * 3) % 256, (yy * 5) % 256, ((xx + yy) * 2) % 256], axis=-1
    ).astype(np.uint8)
    assert psnr(smooth, decode_jpeg(encode_jpeg(smooth, quality=90))) > 40

    gray = rng.randint(0, 256, (9, 14)).astype(np.uint8)
    gout = decode_jpeg(encode_jpeg(gray, quality=95))
    assert gout.shape == (9, 14, 1)
    assert psnr(gray[..., None], gout) > 25


def test_jpeg_container_is_wellformed():
    """The emitted bytes are a real JFIF container: SOI first, APP0/
    DQT/SOF0/DHT/SOS segments with consistent lengths, EOI last, and no
    bare 0xFF inside the entropy stream (byte stuffing) — what any
    stock decoder checks before touching coefficients."""
    import struct

    import numpy as np

    from distributed_computing_spark.functions.jpeg import encode_jpeg

    data = encode_jpeg(np.full((16, 16, 3), 77, np.uint8))
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    pos, tags = 2, []
    while True:
        assert data[pos] == 0xFF
        tag = data[pos + 1]
        tags.append(tag)
        if tag == 0xDA:
            (ln,) = struct.unpack_from(">H", data, pos + 2)
            scan_start = pos + 2 + ln
            break
        (ln,) = struct.unpack_from(">H", data, pos + 2)
        pos += 2 + ln
    assert tags[0] == 0xE0  # JFIF APP0 first
    assert 0xDB in tags and 0xC0 in tags and 0xC4 in tags
    # entropy stream: every 0xFF is followed by 0x00 (stuffing) until EOI
    i = scan_start
    while i < len(data) - 2:
        if data[i] == 0xFF:
            assert data[i + 1] == 0x00
            i += 2
        else:
            i += 1


def test_jpeg_solid_color_matches_closed_form_for_all_256_colors():
    """The planted-content contract behind multimodal_jpeg_decode's
    oracle: with a flat q=16 table and the codec's exact-DC rounding,
    decode(encode(solid)) equals the closed-form chain for EVERY color
    the doc_id formula can produce (colors depend only on doc_id mod
    256, so 256 consecutive ids cover the whole domain)."""
    import numpy as np

    from distributed_computing_spark.functions.jpeg import (
        Q_FLAT16,
        decode_jpeg,
        encode_jpeg,
    )

    def rhu(x):
        return np.floor(x + 0.5)

    def closed(r, g, b):
        y = min(max(rhu(0.299 * r + 0.587 * g + 0.114 * b), 0.0), 255.0)
        cb = min(max(rhu(128 - 0.168736 * r - 0.331264 * g + 0.5 * b), 0.0), 255.0)
        cr = min(max(rhu(128 + 0.5 * r - 0.418688 * g - 0.081312 * b), 0.0), 255.0)

        def chan(c):
            return 16 * rhu(8 * (c - 128) / 16) / 8 + 128

        y1, cb1, cr1 = chan(y), chan(cb), chan(cr)
        r1 = min(max(rhu(y1 + 1.402 * (cr1 - 128)), 0.0), 255.0)
        g1 = min(
            max(rhu(y1 - 0.344136 * (cb1 - 128) - 0.714136 * (cr1 - 128)), 0.0),
            255.0,
        )
        b1 = min(max(rhu(y1 + 1.772 * (cb1 - 128)), 0.0), 255.0)
        return (r1, g1, b1)

    for did in range(256):
        r, g, b = (did * 7) % 256, (did * 13) % 256, (did * 29) % 256
        px = np.zeros((16, 16, 3), np.uint8)
        px[..., 0], px[..., 1], px[..., 2] = r, g, b
        out = decode_jpeg(encode_jpeg(px, qtables=(Q_FLAT16, Q_FLAT16)))
        assert len(np.unique(out.reshape(-1, 3), axis=0)) == 1, did
        got = tuple(float(v) for v in out[0, 0])
        assert got == closed(float(r), float(g), float(b)), (did, got)


def test_jpeg_decode_rejects_unsupported_and_malformed():
    """ValueError contract: progressive SOF2, restart intervals,
    truncated entropy data, and non-JPEG bytes all fail loudly."""
    import struct

    import numpy as np
    import pytest

    from distributed_computing_spark.functions.jpeg import decode_jpeg, encode_jpeg

    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG1234")

    good = encode_jpeg(np.full((8, 8, 3), 42, np.uint8))
    # flip SOF0 (0xC0) to SOF2 (0xC2): progressive must be rejected
    i = good.index(b"\xff\xc0")
    prog = good[:i] + b"\xff\xc2" + good[i + 2 :]
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(prog)

    # inject a DRI segment with a non-zero interval before SOS
    j = good.index(b"\xff\xda")
    dri = b"\xff\xdd" + struct.pack(">HH", 4, 8)
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg(good[:j] + dri + good[j:])

    # truncate inside the entropy stream of a content-heavy image
    rng = np.random.RandomState(0)
    busy = encode_jpeg(rng.randint(0, 256, (16, 16, 3)).astype(np.uint8))
    k = busy.index(b"\xff\xda")
    with pytest.raises(ValueError, match="truncated|marker|Huffman"):
        decode_jpeg(busy[: k + 16])

    # ADVICE r5: standalone markers (TEM 0x01, RST0-7, stray SOI) have
    # NO length field — they must fail cleanly, never be misparsed as a
    # length-prefixed segment that skips an arbitrary byte span.
    for marker in (b"\xff\x01", b"\xff\xd3", b"\xff\xd8"):
        with pytest.raises(ValueError, match="standalone marker"):
            decode_jpeg(good[:j] + marker + good[j:])


def test_jpeg_spark_decode_means(spark, sf_dir):
    """decode_images_jpeg over jpeg_blobs: per-channel means equal the
    closed-form chain (the oracle's arithmetic) for every doc."""
    import numpy as np

    from distributed_computing_spark.operators.multimodal import (
        decode_images_jpeg,
        jpeg_blobs,
    )
    from distributed_computing_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").limit(40)
    rows = decode_images_jpeg(jpeg_blobs(docs)).collect()
    assert len(rows) == 40

    def rhu(x):
        return np.floor(x + 0.5)

    for row in rows:
        did = row["blob_id"]
        r, g, b = (
            float((did * 7) % 256),
            float((did * 13) % 256),
            float((did * 29) % 256),
        )
        y = min(max(rhu(0.299 * r + 0.587 * g + 0.114 * b), 0.0), 255.0)
        cb = min(max(rhu(128 - 0.168736 * r - 0.331264 * g + 0.5 * b), 0.0), 255.0)
        cr = min(max(rhu(128 + 0.5 * r - 0.418688 * g - 0.081312 * b), 0.0), 255.0)
        y1 = 16 * rhu(8 * (y - 128) / 16) / 8 + 128
        cb1 = 16 * rhu(8 * (cb - 128) / 16) / 8 + 128
        cr1 = 16 * rhu(8 * (cr - 128) / 16) / 8 + 128
        assert row["width"] == 16 and row["height"] == 16
        assert row["mean_r"] == min(max(rhu(y1 + 1.402 * (cr1 - 128)), 0.0), 255.0)
        assert row["mean_g"] == min(
            max(rhu(y1 - 0.344136 * (cb1 - 128) - 0.714136 * (cr1 - 128)), 0.0),
            255.0,
        )
        assert row["mean_b"] == min(max(rhu(y1 + 1.772 * (cb1 - 128)), 0.0), 255.0)


def test_jpeg_decoder_handles_420_chroma_subsampling():
    """The decoder's sampling-factor path (h,v dividing hmax,vmax) has
    no encoder-side producer (we always write 4:4:4), so craft a
    minimal DC-only 4:2:0 file by hand: Y at 2x2 blocks per MCU, Cb/Cr
    at 1x1, flat q=16 — decode must upsample chroma by replication and
    reconstruct the exact solid color."""
    import struct

    import numpy as np

    from distributed_computing_spark.functions.jpeg import (
        _AC_LUMA_SPEC,
        _DC_LUMA_SPEC,
        _BitWriter,
        _canonical_codes,
        _category,
        _encode_coefficient_bits,
        decode_jpeg,
    )

    def marker(tag, body):
        return struct.pack(">BBH", 0xFF, tag, len(body) + 2) + body

    h = w = 16  # one MCU at 4:2:0
    y_val, cb_val, cr_val = 90, 140, 120  # the planted YCbCr solid

    out = bytearray(b"\xff\xd8")
    out += marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += marker(0xDB, bytes([0]) + bytes([16] * 64))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, 0x22, 0])  # Y: h=2, v=2
    sof += bytes([2, 0x11, 0])  # Cb: 1x1
    sof += bytes([3, 0x11, 0])  # Cr: 1x1
    out += marker(0xC0, sof)
    for cls, tid, spec in ((0, 0, _DC_LUMA_SPEC), (1, 0, _AC_LUMA_SPEC)):
        bits, vals = spec
        out += marker(0xC4, bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals))
    sos = bytes([3]) + bytes([1, 0x00, 2, 0x00, 3, 0x00]) + bytes([0, 63, 0])
    out += marker(0xDA, sos)

    dc_codes = _canonical_codes(*_DC_LUMA_SPEC)
    ac_codes = _canonical_codes(*_AC_LUMA_SPEC)
    bw = _BitWriter()

    def emit_block(diff):
        cat = _category(diff)
        code, ln = dc_codes[cat]
        bw.write(code, ln)
        if cat:
            bw.write(_encode_coefficient_bits(diff, cat), cat)
        code, ln = ac_codes[0x00]  # EOB (all AC zero)
        bw.write(code, ln)

    # MCU order at 4:2:0: four Y blocks, then Cb, then Cr. DC diffs are
    # per-component: first Y block carries qDC, the other three carry 0.
    def qdc(c):
        return int(np.floor(8 * (c - 128) / 16 + 0.5))

    emit_block(qdc(y_val))
    for _ in range(3):
        emit_block(0)
    emit_block(qdc(cb_val))
    emit_block(qdc(cr_val))
    bw.flush()
    out += bw.buf + b"\xff\xd9"

    img = decode_jpeg(bytes(out))
    assert img.shape == (16, 16, 3)
    assert len(np.unique(img.reshape(-1, 3), axis=0)) == 1  # chroma upsampled flat

    # expected color via the closed-form chain on reconstructed planes
    def rhu(x):
        return np.floor(x + 0.5)

    y1 = 16 * qdc(y_val) / 8 + 128
    cb1 = 16 * qdc(cb_val) / 8 + 128
    cr1 = 16 * qdc(cr_val) / 8 + 128
    want = (
        min(max(rhu(y1 + 1.402 * (cr1 - 128)), 0.0), 255.0),
        min(max(rhu(y1 - 0.344136 * (cb1 - 128) - 0.714136 * (cr1 - 128)), 0.0), 255.0),
        min(max(rhu(y1 + 1.772 * (cb1 - 128)), 0.0), 255.0),
    )
    assert tuple(float(v) for v in img[0, 0]) == want


def test_png_batched_unfilter_matches_scalar_through_spark(spark):
    """round 5: decode_images_png's batched unfilter (same-shape group)
    and its scalar fallback (odd shapes) must both land in one Arrow
    batch and agree with per-image decode_png — mixed filter types,
    mixed shapes, one mapInPandas pass."""
    import numpy as np

    from distributed_computing_spark.functions.codecs import decode_png, encode_png
    from distributed_computing_spark.operators.multimodal import decode_images_png

    rng = np.random.RandomState(13)
    rows, want = [], {}
    for i in range(24):
        if i % 4 == 3:  # odd 24x24 -> batched (divisible by 8)
            px = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
        else:  # 16x16 -> batched group
            px = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
        blob = encode_png(px, filter_type=i % 5)
        rows.append((i, bytearray(blob)))
        img = decode_png(blob)
        want[i] = (img.shape[1], img.shape[0])
    # a non-divisible shape exercises the scalar fallback
    px = rng.randint(0, 256, (12, 20, 3)).astype(np.uint8)
    rows.append((100, bytearray(encode_png(px, filter_type=4))))

    df = spark.createDataFrame(rows, "blob_id long, data binary")
    got = {r["blob_id"]: r for r in decode_images_png(df, out_w=4, out_h=4).collect()}
    assert len(got) == 25
    for i, (w, h) in want.items():
        assert (got[i]["width"], got[i]["height"]) == (w, h)
    # value parity vs scalar decode + mean_pool for a batched member
    from distributed_computing_spark.functions.codecs import mean_pool

    img = decode_png(bytes(rows[0][1]))
    small = mean_pool(img, 4, 4)
    assert got[0]["mean_r"] == float(small[..., 0].mean())
    assert (got[100]["width"], got[100]["height"]) == (20, 12)


# --- GIF codec ---------------------------------------------------------------


def test_gif_decodes_spec_reference_vector(spark):
    """The canonical 1x1 white GIF89a from the spec (widely published
    byte-for-byte) pins signature parse, GCT, LSB-first bit order, and
    clear/EOI handling against an EXTERNAL reference — the encoder and
    decoder can't share a complementary bug here."""
    import numpy as np

    from distributed_computing_spark.functions.codecs import decode_gif

    ref = bytes.fromhex(
        "474946383961010001008000"
        "00ffffff000000"
        "2c000000000100010000"
        "02024401003b"
    )
    px = decode_gif(ref)
    assert px.shape == (1, 1, 3) and px.tolist() == [[[255, 255, 255]]]


def test_gif_roundtrip_exercises_lzw_growth_and_reset(spark):
    import numpy as np

    from distributed_computing_spark.functions.codecs import (
        decode_gif,
        encode_gif,
    )

    rng = np.random.RandomState(7)
    # 2-color 200x200: code width grows 3..12; 400x400 crosses the
    # 4096-entry dictionary reset; 256-color exercises 8-bit min codes
    cases = [
        ((200, 200), 2),
        ((400, 400), 2),
        ((13, 9), 256),
        ((1, 300), 256),
        ((1, 1), 2),
    ]
    for shape, ncol in cases:
        pal = rng.randint(0, 256, size=(ncol, 3), dtype=np.uint8)
        img = pal[rng.randint(0, ncol, size=shape)]
        assert np.array_equal(decode_gif(encode_gif(img)), img), (shape, ncol)


def test_gif_rejects_unsupported_features(spark):
    import numpy as np
    import pytest

    from distributed_computing_spark.functions.codecs import (
        decode_gif,
        encode_gif,
    )

    img = np.zeros((4, 4, 3), np.uint8)
    data = bytearray(encode_gif(img))
    data[:6] = b"NOTGIF"
    with pytest.raises(ValueError, match="signature"):
        decode_gif(bytes(data))
    with pytest.raises(ValueError, match="256 distinct"):
        encode_gif(
            np.stack(
                [np.arange(257) % 256, np.arange(257) // 1 % 7 + 1,
                 np.ones(257)], axis=-1
            ).reshape(1, 257, 3).astype(np.uint8)
        )


def test_gif_decode_query_matches_closed_form(spark):
    from distributed_computing_spark.operators import multimodal

    docs = spark.createDataFrame(
        [(i, "x") for i in range(0, 40, 3)], "doc_id long, text string"
    )
    rows = multimodal.decode_images_gif(multimodal.gif_blobs(docs)).collect()
    for r in rows:
        d = r["blob_id"]
        assert (r["width"], r["height"]) == (16, 16)
        assert r["mean_r"] == ((d * 7) % 256 + (d * 11) % 256) / 2
        assert r["mean_g"] == ((d * 13) % 256 + (d * 17) % 256) / 2
        assert r["mean_b"] == ((d * 29) % 256 + (d * 23) % 256) / 2


# ---------------------------------------------------------------------------
# Round 9: perceptual-hash image near-dup
# ---------------------------------------------------------------------------


def test_image_dhash_neardup_matches_python_twin(spark):
    """EXACT twin of the rows-only gated query: a pure-Python replay —
    same pixel function (textured_pixels), same dhash_py, brute-force
    all-pairs Hamming — must produce the identical pair set the banded
    Spark plan emits (pigeonhole completeness + verify correctness in
    one assertion), and the planted same-seed near-dups must be in it."""
    import duckdb

    from distributed_computing_spark.registry import QUERIES
    from distributed_computing_spark.operators.multimodal import (
        dhash_py,
        textured_pixels,
    )
    from tests.conftest import SF_DIR

    got = {
        (r["a"], r["b"], r["hamming"])
        for r in QUERIES["image_dhash_neardup"](spark, SF_DIR).collect()
    }
    ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
        ).fetchall()
    ]
    hashes = {d: dhash_py(textured_pixels(d)) for d in ids}
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = bin(hashes[a] ^ hashes[b]).count("1")
            if ham <= 4:
                want.add((a, b, ham))
    assert got == want
    assert want, "planted near-duplicates must produce at least one pair"
    # at least one SAME-SEED planted pair survives the threshold
    assert any(a // 20 == b // 20 for a, b, _ in want)


def test_image_neardup_pigeonhole_contract(spark):
    """max_hamming beyond the band guarantee raises; an over-sized
    band bucket (here: many identical hashes) is dropped by the
    ABSOLUTE cap rather than exploding |bucket|^2."""
    import pytest

    from distributed_computing_spark.operators.multimodal import (
        image_neardup_pairs,
    )

    hashes = spark.createDataFrame(
        [(i, 12345) for i in range(10)], "blob_id long, dhash long"
    )
    with pytest.raises(ValueError, match="pigeonhole"):
        image_neardup_pairs(hashes, max_hamming=7)
    # 10 identical hashes, cap 5: every band bucket has 10 members ->
    # all dropped, no pairs; cap 100 admits all 45 zero-distance pairs
    assert image_neardup_pairs(hashes, max_bucket=5).count() == 0
    assert image_neardup_pairs(hashes, max_bucket=100).count() == 45


def test_video_dhash_neardup_matches_python_twin(spark):
    """EXACT twin of the rows-only video near-dup: pure-Python replay
    (same textured frame function via textured_pixels, same dhash_py,
    brute-force shared-frame counting) must equal the distributed
    frame-hash join's pair set — and planted same-seed videos must
    dominate it (group_size=20, 8 frames, members differ in one slot
    => same-seed pairs share >= 6 frames)."""
    import duckdb

    from distributed_computing_spark.registry import QUERIES
    from distributed_computing_spark.operators.multimodal import (
        dhash_py,
        textured_pixels,
    )
    from tests.conftest import SF_DIR

    got = {
        (r["a"], r["b"], r["n_shared"])
        for r in QUERIES["video_dhash_neardup"](spark, SF_DIR).collect()
    }
    ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
        ).fetchall()
    ]
    n_frames, gs = 8, 20

    def hashes(did):
        seed, member = did // gs, did % gs
        hs = [
            dhash_py(textured_pixels(seed * 997 + f * 31, 1))
            for f in range(n_frames)
        ]
        slot = member % n_frames
        hs[slot] = dhash_py(
            textured_pixels(500_000 + seed * 997 + slot * 31 + member, 1)
        )
        return set(hs)

    hsets = {d: hashes(d) for d in ids}
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            n = len(hsets[a] & hsets[b])
            if n >= 4:
                want.add((a, b, n))
    assert got == want and want
    # every same-seed pair is found (shares >= 6 of 8 frames)
    same_seed = {(a, b) for a, b, _ in want if a // gs == b // gs}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if a // gs == b // gs:
                assert (a, b) in same_seed
