"""MP3 frame layer (functions/mp3.py): honest-scope tests.

The writer emits spec-valid MPEG-1 Layer III mono silence frames; the
parser must recover every header/side-info field, the frame-size
arithmetic must match the spec formula across all 14 CBR bitrates and
all 3 sample rates, truncation must raise the ValueError contract (the
GIF/PNG discipline), and the decode path must be exact for the zero
spectrum and raise NotImplementedError NAMING the blocked spec tables
for any nonzero spectrum (the recorded round-7 dead end)."""

import numpy as np
import pytest

from distributed_computing_spark.functions.mp3 import (
    BITRATE_KBPS,
    SAMPLE_RATES,
    SAMPLES_PER_FRAME,
    decode_mp3,
    encode_mp3_silence,
    frame_length,
    parse_mp3,
)


def test_frame_length_spec_formula():
    # spot values computed by hand from floor(144000*kbps/fs):
    assert frame_length(9, 0, 0) == 144000 * 128 // 44100  # 417
    assert frame_length(9, 0, 1) == 418
    assert frame_length(14, 1, 0) == 144000 * 320 // 48000  # 960
    assert frame_length(1, 2, 0) == 144000 * 32 // 32000  # 144
    for bi in range(1, 15):
        for si in range(3):
            assert (
                frame_length(bi, si, 0)
                == 144000 * BITRATE_KBPS[bi] // SAMPLE_RATES[si]
            )


def test_roundtrip_all_bitrates_and_fields():
    for bi in range(1, 15):
        data = encode_mp3_silence(
            3, bi, 0, global_gain=201, scalefac_compress=7
        )
        frames = parse_mp3(data)
        assert len(frames) == 3
        assert len(data) == sum(f["frame_bytes"] for f in frames)
        for f in frames:
            assert f["bitrate_kbps"] == BITRATE_KBPS[bi]
            assert f["sample_rate"] == 44100
            assert not f["protection"]
            si = f["side_info"]
            assert si["main_data_begin"] == 0
            for g in si["granules"]:
                assert g["part2_3_length"] == 0
                assert g["big_values"] == 0
                assert g["global_gain"] == 201
                assert g["scalefac_compress"] == 7
                assert g["window_switching"] == 0
                assert g["count1table_select"] == 0


def test_silence_decode_exact():
    data = encode_mp3_silence(5, 9)
    pcm = decode_mp3(data)
    assert pcm.dtype == np.int16
    assert len(pcm) == 5 * SAMPLES_PER_FRAME
    assert not pcm.any()


def test_truncation_raises_valueerror():
    data = encode_mp3_silence(2, 9)
    for cut in (0, 2, 5, 20, len(data) - 1):
        with pytest.raises(ValueError):
            parse_mp3(data[:cut])


def test_lost_sync_and_bad_streams():
    with pytest.raises(ValueError, match="sync"):
        parse_mp3(b"\x00" * 64)
    # MPEG-2 / other layers rejected loudly (only MPEG-1 Layer III)
    data = bytearray(encode_mp3_silence(1, 9))
    data[1] &= ~0x08  # version bit -> MPEG-2
    with pytest.raises(ValueError, match="MPEG-1"):
        parse_mp3(bytes(data))
    # free-format bitrate index 0 rejected
    data = bytearray(encode_mp3_silence(1, 9))
    data[2] &= 0x0F  # bitrate_index -> 0
    with pytest.raises(ValueError, match="bitrate"):
        parse_mp3(bytes(data))


def test_nonzero_spectrum_is_the_recorded_dead_end():
    """Nonzero part2_3_length must raise NotImplementedError naming
    BOTH blocked tables — the honest boundary of the round-7 timebox
    (a from-memory transcription would be unverifiable here)."""
    data = bytearray(encode_mp3_silence(1, 9))
    # side info starts at byte 4; part2_3_length begins at side-info
    # bit 18 (after main_data_begin 9 + private 5 + scfsi 4)
    data[6] |= 0b00100000
    frames = parse_mp3(bytes(data))
    assert frames[0]["side_info"]["granules"][0]["part2_3_length"] > 0
    with pytest.raises(NotImplementedError) as ei:
        decode_mp3(bytes(data))
    assert "B.7" in str(ei.value) and "B.3" in str(ei.value)


def test_writer_validates_inputs():
    with pytest.raises(ValueError):
        encode_mp3_silence(1, 0)  # free-format not writable
    with pytest.raises(ValueError):
        encode_mp3_silence(1, 15)
    with pytest.raises(ValueError):
        encode_mp3_silence(1, 9, 3)  # bad sample rate index


def test_roundtrip_property_random_streams():
    """Hypothesis round trip: any (n_frames, bitrate_index,
    sample_rate_index, global_gain, scalefac_compress) writes a stream
    whose parse recovers every field, whose frame-size sum equals the
    byte length, and whose silence decode is exactly 1152·n_frames
    zeros."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        n_frames=st.integers(1, 6),
        bi=st.integers(1, 14),
        si=st.integers(0, 2),
        gg=st.integers(0, 255),
        sc=st.integers(0, 15),
    )
    def check(n_frames, bi, si, gg, sc):
        data = encode_mp3_silence(n_frames, bi, si, gg, sc)
        frames = parse_mp3(data)
        assert len(frames) == n_frames
        assert sum(f["frame_bytes"] for f in frames) == len(data)
        for f in frames:
            assert f["bitrate_kbps"] == BITRATE_KBPS[bi]
            assert f["sample_rate"] == SAMPLE_RATES[si]
            for g in f["side_info"]["granules"]:
                assert g["global_gain"] == gg
                assert g["scalefac_compress"] == sc
        pcm = decode_mp3(data)
        assert len(pcm) == n_frames * SAMPLES_PER_FRAME and not pcm.any()

    check()
