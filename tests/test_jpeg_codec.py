"""Baseline JPEG codec (functions/multimodal.py): bit-exact round trip
on block-constant images (the property the SQL oracle relies on),
bounded error on arbitrary content, edge-padding crop, and loud
failures on legal-but-unsupported features."""

from __future__ import annotations

import numpy as np
import pytest

from report_worker_spark.functions import multimodal as mm


def test_block_constant_roundtrip_exact():
    for seed in (0, 1, 7, 123, 499):
        w, h = (seed % 4 + 1) * 8, (seed % 3 + 1) * 8
        d = mm.decode_jpeg_pixels(mm.jpeg_const_bytes(w, h, seed))
        bw, bh = w // 8, h // 8
        ks = mm.keystream(f"{seed}:jpg", bw * bh)
        expect = np.repeat(
            np.repeat(
                np.frombuffer(ks, np.uint8).reshape(bh, bw), 8, axis=0
            ),
            8,
            axis=1,
        )
        got = np.frombuffer(d["pixels"], np.uint8).reshape(h, w)
        assert (got == expect).all()
        assert (d["width"], d["height"], d["channels"]) == (w, h, 1)


def test_gray_roundtrip_tolerance():
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, size=(24, 16), dtype=np.uint8)
    d = mm.decode_jpeg_pixels(
        mm.encode_jpeg_baseline(img.tobytes(), 16, 24, 1)
    )
    got = np.frombuffer(d["pixels"], np.uint8).reshape(24, 16)
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 2


def test_rgb_roundtrip_tolerance():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    d = mm.decode_jpeg_pixels(
        mm.encode_jpeg_baseline(img.tobytes(), 16, 16, 3)
    )
    assert d["channels"] == 3
    got = np.frombuffer(d["pixels"], np.uint8).reshape(16, 16, 3)
    # float DCT + two YCbCr integer roundings
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 4


def test_non_multiple_of_8_dims_cropped():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(10, 13), dtype=np.uint8)
    d = mm.decode_jpeg_pixels(
        mm.encode_jpeg_baseline(img.tobytes(), 13, 10, 1)
    )
    assert (d["width"], d["height"]) == (13, 10)
    got = np.frombuffer(d["pixels"], np.uint8).reshape(10, 13)
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 2


def test_header_parser_reads_codec_output():
    enc = mm.jpeg_const_bytes(16, 8, 5)
    hdr = mm.parse_jpeg_header(enc)
    assert hdr == {
        "format": "jpeg", "width": 16, "height": 8,
        "bit_depth": 8, "channels": 1,
    }


def test_unsupported_features_fail_loudly():
    enc = bytearray(mm.jpeg_const_bytes(8, 8, 1))
    # progressive: flip SOF0 marker to SOF2
    i = bytes(enc).find(b"\xff\xc0")
    prog = enc.copy()
    prog[i + 1] = 0xC2
    with pytest.raises(ValueError, match="SOF2"):
        mm.decode_jpeg_pixels(bytes(prog))
    # subsampling: set sampling factors to 2x2
    sub = enc.copy()
    sub[i + 11] = 0x22  # component 1 sampling byte
    with pytest.raises(ValueError, match="subsampling"):
        mm.decode_jpeg_pixels(bytes(sub))
    # truncation mid-scan
    with pytest.raises(ValueError):
        mm.decode_jpeg_pixels(bytes(enc[:-10]) )
    # not a JPEG at all
    with pytest.raises(ValueError, match="SOI"):
        mm.decode_jpeg_pixels(b"\x00\x01")


def test_header_only_legacy_jpeg_rejected_by_pixel_decode():
    """The legacy header-only generator (no scan data) must raise, not
    return garbage pixels."""
    legacy = mm.jpeg_bytes(16, 8, 3)
    with pytest.raises(ValueError):
        mm.decode_jpeg_pixels(legacy)


def test_jpeg_420_block_constant_roundtrip_exact():
    """MCU-constant 4:2:0 fixtures round-trip bit-exactly: DC-only
    blocks at quant=1, replication chroma upsampling, and the fixed
    reconstruction formula reproduce the intended RGB precisely."""
    W, H, seed = 48, 32, 9
    enc = mm.jpeg420_bytes(W, H, seed)
    d = mm.decode_jpeg_pixels(enc)
    assert (d["width"], d["height"], d["channels"]) == (W, H, 3)
    got = np.frombuffer(d["pixels"], np.uint8).reshape(H, W, 3)

    mbx, mby = W // 16, H // 16
    ks = mm.keystream(f"{seed}:jpg420", mby * mbx * 3)
    arr = np.frombuffer(ks, np.uint8).reshape(mby, mbx, 3).astype(np.int64)
    y = np.repeat(np.repeat(arr[:, :, 0], 16, 0), 16, 1).astype(np.float64)
    cb = np.repeat(
        np.repeat(4 + arr[:, :, 1] % 248, 16, 0), 16, 1
    ).astype(np.float64)
    cr = np.repeat(np.repeat(arr[:, :, 2], 16, 0), 16, 1).astype(np.float64)
    want = np.stack(
        [
            np.clip(np.rint(y + 1.402 * (cr - 128.0)), 0, 255),
            np.clip(
                np.rint(
                    y
                    - 0.344136286 * (cb - 128.0)
                    - 0.714136286 * (cr - 128.0)
                ),
                0,
                255,
            ),
            np.clip(np.rint(y + 1.772 * (cb - 128.0)), 0, 255),
        ],
        axis=-1,
    ).astype(np.uint8)
    assert np.array_equal(got, want)


def test_jpeg_420_arbitrary_content_tolerance():
    """Non-constant 4:2:0 content round-trips within the float-DCT
    tolerance against the plane-level reference reconstruction."""
    rng = np.random.RandomState(7)
    W, H = 32, 32
    y = rng.randint(0, 256, (H, W), dtype=np.uint8)
    cb = rng.randint(0, 256, (H // 2, W // 2), dtype=np.uint8)
    cr = rng.randint(0, 256, (H // 2, W // 2), dtype=np.uint8)
    enc = mm.encode_jpeg_420(y.tobytes(), cb.tobytes(), cr.tobytes(), W, H)
    got = np.frombuffer(
        mm.decode_jpeg_pixels(enc)["pixels"], np.uint8
    ).reshape(H, W, 3).astype(int)
    yf = y.astype(float)
    cbf = np.repeat(np.repeat(cb, 2, 0), 2, 1).astype(float)
    crf = np.repeat(np.repeat(cr, 2, 0), 2, 1).astype(float)
    want = np.stack(
        [
            np.clip(np.rint(yf + 1.402 * (crf - 128.0)), 0, 255),
            np.clip(
                np.rint(
                    yf
                    - 0.344136286 * (cbf - 128.0)
                    - 0.714136286 * (crf - 128.0)
                ),
                0,
                255,
            ),
            np.clip(np.rint(yf + 1.772 * (cbf - 128.0)), 0, 255),
        ],
        axis=-1,
    ).astype(int)
    assert np.abs(got - want).max() <= 4


def test_jpeg_420_guards():
    """Whole-MCU dims enforced; grayscale sampling declarations stay
    loud; progressive still quarantines after the 4:2:0 extension."""
    with pytest.raises(ValueError, match="16"):
        mm.jpeg420_bytes(24, 16, 1)
    enc = bytearray(mm.jpeg420_bytes(16, 16, 1))
    i = bytes(enc).find(b"\xff\xc0")
    prog = enc.copy()
    prog[i + 1] = 0xC2
    with pytest.raises(ValueError, match="SOF2"):
        mm.decode_jpeg_pixels(bytes(prog))
    # factors > 2 refused
    big = enc.copy()
    big[i + 11] = 0x44  # Y component sampling 4x4
    with pytest.raises(ValueError, match="unsupported"):
        mm.decode_jpeg_pixels(bytes(big))
