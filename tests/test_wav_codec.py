"""RIFF PCM WAV codec (functions/multimodal.py): lossless round trips
for both sample widths, chunk word-alignment, and loud failures on
compressed/truncated streams."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from report_worker_spark.functions import multimodal as mm


def test_8bit_roundtrip_exact():
    samples = mm.keystream("a", 100)
    d = mm.decode_wav_samples(mm.encode_wav(samples, 16000, 1, 8))
    assert d["samples"] == samples
    assert (d["n_frames"], d["sample_rate"], d["bits"], d["channels"]) == (
        100, 16000, 8, 1,
    )


def test_16bit_stereo_roundtrip_exact():
    rng = np.random.default_rng(5)
    sm = rng.integers(-32768, 32768, size=240, dtype=np.int16)
    d = mm.decode_wav_samples(mm.encode_wav(sm.tobytes(), 44100, 2, 16))
    assert np.array_equal(np.frombuffer(d["samples"], "<i2"), sm)
    assert (d["n_frames"], d["channels"], d["bits"]) == (120, 2, 16)


def test_odd_length_chunk_alignment():
    """A preceding odd-length chunk must be padded to a word boundary
    (RIFF rule) — the walker has to skip the pad byte to find data."""
    samples = mm.keystream("b", 33)
    wav = bytearray(mm.encode_wav(samples, 8000, 1, 8))
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded
    patched = wav[:12] + extra + wav[12:]
    patched[4:8] = struct.pack("<I", len(patched) - 8)
    d = mm.decode_wav_samples(bytes(patched))
    assert d["samples"] == samples


def test_compressed_format_rejected():
    wav = bytearray(mm.encode_wav(mm.keystream("c", 16), 8000, 1, 8))
    i = bytes(wav).find(b"fmt ") + 8
    wav[i : i + 2] = struct.pack("<H", 85)  # MP3 format tag
    with pytest.raises(ValueError, match="compressed"):
        mm.decode_wav_samples(bytes(wav))


def test_truncated_rejected():
    wav = mm.encode_wav(mm.keystream("d", 64), 8000, 1, 8)
    with pytest.raises(ValueError):
        mm.decode_wav_samples(wav[:-5])
    with pytest.raises(ValueError, match="RIFF"):
        mm.decode_wav_samples(b"nope")


# --- ISO-BMFF (MP4) box walker ---------------------------------------------


def test_mp4_roundtrip():
    b = mm.mp4_bytes(5000, 320, 240, 7)
    assert mm.parse_mp4_header(b) == {
        "format": "mp4", "duration_ms": 5000, "width": 320, "height": 240,
    }


def test_mp4_timescale_math():
    """Duration must be converted through mvhd's declared timescale,
    not assumed to be ms."""
    import struct
    b = bytearray(mm.mp4_bytes(8000, 64, 48, 1))
    i = bytes(b).find(b"mvhd") + 4
    # timescale 1000 -> 500 (duration field now counts half-seconds...
    # i.e. the same stored duration must read as 2x the ms)
    assert struct.unpack(">I", b[i + 12 : i + 16])[0] == 1000
    b[i + 12 : i + 16] = struct.pack(">I", 500)
    assert mm.parse_mp4_header(bytes(b))["duration_ms"] == 16000


def test_mp4_failures_loud():
    import pytest as _pytest
    b = mm.mp4_bytes(1000, 16, 16, 2)
    with _pytest.raises(ValueError):
        mm.parse_mp4_header(b[:-4])
    with _pytest.raises(ValueError):
        mm.parse_mp4_header(b"\x00" * 20)
    # moov removed -> loud
    ftyp_len = int.from_bytes(b[:4], "big")
    with _pytest.raises(ValueError, match="moov"):
        mm.parse_mp4_header(b[:ftyp_len])


def test_odd_data_chunk_emits_pad_byte():
    """ADVICE_r5 (low): an odd-length data chunk must carry a zero pad
    byte (excluded from the chunk size field, included in RIFF size)
    so a strict word-aligned reader parses any following chunk."""
    samples = mm.keystream("c", 33)  # odd 8-bit mono payload
    wav = mm.encode_wav(samples, 8000, 1, 8)
    assert len(wav) % 2 == 0
    # RIFF size field spans the whole remainder including the pad
    assert struct.unpack("<I", wav[4:8])[0] == len(wav) - 8
    # data chunk: size field excludes the pad, trailing byte is zero
    i = wav.index(b"data")
    assert struct.unpack("<I", wav[i + 4 : i + 8])[0] == 33
    assert wav[-1] == 0
    # decode still returns the exact samples
    assert mm.decode_wav_samples(wav)["samples"] == samples
    # a chunk appended AFTER the padded data chunk must still be
    # reachable by the word-aligned walk
    trailer = b"LIST" + struct.pack("<I", 4) + b"info"
    patched = bytearray(wav + trailer)
    patched[4:8] = struct.pack("<I", len(patched) - 8)
    assert mm.decode_wav_samples(bytes(patched))["samples"] == samples
