from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from report_worker_spark.functions import multimodal as mm
from report_worker_spark.plans.tables import load
from tests.conftest import await_finished


@pytest.fixture(scope="module")
def media(spark, sf_small):
    docs = load(spark, sf_small, "documents")
    return mm.synthetic_media(docs, "doc_id", "text").cache()


def test_media_schema_and_meta(media):
    assert dict(media.dtypes)["content"] == "binary"
    rows = media.collect()
    assert len(rows) > 0
    for r in rows:
        assert r.kind in ("image", "audio", "video")
        assert len(r.content) == 48  # 3 md5 blocks
        if r.kind == "image":
            assert r.meta.width is not None and r.meta.duration_ms is None
        if r.kind == "audio":
            assert r.meta.sample_rate == 16000 and r.meta.width is None


def test_default_decoder_is_stubbed(media):
    with pytest.raises(Exception) as exc_info:
        mm.extract_features(media).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_fake_decoder_features_deterministic(media):
    feats = mm.extract_features(media, decoder=mm.fake_decoder)
    a = sorted(map(tuple, feats.collect()))
    b = sorted(map(tuple, mm.extract_features(media, decoder=mm.fake_decoder).collect()))
    assert a == b
    df = feats.toPandas()
    assert (df.n_bytes == 48).all()
    assert df.content_sha1.nunique() == len(df)  # distinct docs → distinct bytes
    assert ((df.byte_entropy > 4.0) & (df.byte_entropy <= 8.0)).all()


def test_feature_count_matches_input(media):
    n_in = media.count()
    n_out = mm.extract_features(media, decoder=mm.fake_decoder).count()
    assert n_in == n_out


def test_frame_sample_plan(media):
    frames = mm.frame_sample_plan(media, every_ms=10_000)
    joined = frames.join(media.select("media_id", "kind"), "media_id")
    assert joined.filter(F.col("kind") != "video").count() == 0
    per_video = frames.groupBy("media_id").count()
    mx = media.filter(F.col("kind") == "video").select(
        F.ceil(F.col("meta.duration_ms") / 10_000).alias("expect"),
        "media_id",
    )
    chk = per_video.join(mx, "media_id").filter(
        F.col("count") != F.col("expect")
    )
    assert chk.count() == 0


def test_png_roundtrip_real_bytes():
    from report_worker_spark.functions import multimodal as mm

    b = mm.png_bytes(17, 9, seed=4)
    hdr = mm.parse_png_header(b)
    assert (hdr["width"], hdr["height"], hdr["bit_depth"], hdr["channels"]) == (
        17, 9, 8, 3,
    )
    # a real decoder must fail loudly on corrupt bytes, not fabricate
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mm.parse_png_header(b"\x89PNX" + b[4:])
    # zlib stream is genuinely valid and matches the declared raw size
    import struct
    import zlib

    idat_len = struct.unpack(">I", b[33:37])[0]
    raw = zlib.decompress(b[41 : 41 + idat_len])
    assert len(raw) == 9 * (1 + 17 * 3)


def test_jpeg_header_roundtrip():
    from report_worker_spark.functions import multimodal as mm

    b = mm.jpeg_bytes(33, 21, seed=7)
    hdr = mm.parse_jpeg_header(b)
    assert (hdr["width"], hdr["height"], hdr["channels"]) == (33, 21, 3)
    with _raises_value_error():
        mm.parse_jpeg_header(b"\x00\x00" + b)


def _raises_value_error():
    import pytest as _pytest

    return _pytest.raises(ValueError)


def test_decoded_features_track_bytes(spark):
    """The r1 stub critique: features must be a function of the BYTES.
    Different ids → different content → different sha1/dims; and the
    parsed dims must equal the generator's intended dims for every row."""
    from pyspark.sql import functions as F

    from report_worker_spark.functions import multimodal as mm

    ids = spark.range(40)
    media = mm.synthetic_image_media(ids, "id")
    feats = mm.extract_image_features(media)
    out = feats.join(media.select("media_id", "meta_w", "meta_h"), on="media_id")
    rows = out.collect()
    assert len(rows) == 40
    assert all(r.width == r.meta_w and r.height == r.meta_h for r in rows)
    assert len({r.content_sha1 for r in rows}) == 40
    assert {r.format for r in rows} == {"png", "jpeg"}
    # byte-level stats differ from header fields: entropy of the zlib
    # stream is high; n_bytes tracks dims
    big = mm.extract_image_features(
        mm.synthetic_image_media(spark.range(100, 101), "id")
    ).first()
    assert big.n_bytes > 50


def test_png_pixel_decode_roundtrip_all_filters():
    """encode_png cycles filters 0-4 by row; decoding must invert every
    one of them and recover the exact keystream samples."""
    from report_worker_spark.functions import multimodal as mm

    for (w, h, seed) in [(17, 9, 4), (32, 24, 100), (2, 2, 7), (5, 6, 11)]:
        ks = mm.keystream(str(seed), w * h * 3)
        d = mm.decode_png_pixels(mm.png_bytes(w, h, seed))
        assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
        assert d["pixels"] == ks


def test_png_pixel_decode_channel_variants_and_corrupt():
    from report_worker_spark.functions import multimodal as mm
    import pytest as _pytest

    for c in (1, 2, 3, 4):  # gray, gray+alpha, RGB, RGBA
        px = mm.keystream("z", 8 * 5 * c)
        rt = mm.decode_png_pixels(mm.encode_png(px, 8, 5, c))
        assert rt["pixels"] == px and rt["channels"] == c
    with _pytest.raises(ValueError):
        mm.decode_png_pixels(b"\x89PNG\r\n\x1a\n" + b"\x00" * 20)
    with _pytest.raises(ValueError):
        mm.decode_png_pixels(b"JUNK")


def test_resize_png_nearest_mapping(spark):
    """Resized pixels must equal src[floor(y*h/oh)][floor(x*w/ow)] —
    verified against a numpy reference on the decoded originals."""
    import numpy as np

    from report_worker_spark.functions import multimodal as mm

    media = mm.synthetic_image_media(spark.range(0, 20), "id")
    resized = {r["media_id"]: bytes(r["content"])
               for r in mm.resize_png(media, 8, 8).collect()}
    originals = {r["media_id"]: bytes(r["content"])
                 for r in media.filter("media_id % 2 = 0").collect()}
    assert set(resized) == set(originals)  # JPEG rows skipped
    for mid, enc in resized.items():
        d0 = mm.decode_png_pixels(originals[mid])
        w, h = d0["width"], d0["height"]
        src = np.frombuffer(d0["pixels"], dtype=np.uint8).reshape(h, w, 3)
        ys, xs = (np.arange(8) * h) // 8, (np.arange(8) * w) // 8
        expect = src[ys][:, xs]
        got = mm.decode_png_pixels(enc)
        assert got["pixels"] == expect.tobytes()


def test_poison_media_quarantined_not_fatal(spark):
    """VERDICT_r5 item 3: one corrupt blob inside a batch must not
    fail the mapInPandas task. Corrupt items are quarantined with
    (ok=false, err) while good items in the SAME batch decode; the
    default surface drops quarantined rows and keeps its schema."""
    png_ok = mm.png_bytes(4, 3, seed=1)
    png_bad = mm.PNG_SIG + b"\x00\x01garbage-not-a-png" * 3
    rows = [(1, png_ok), (2, png_bad), (3, b"not media at all")]
    media = spark.createDataFrame(rows, "media_id long, content binary")

    ok = mm.png_pixel_stats(media).collect()
    assert [r.media_id for r in ok] == [1]
    assert ok[0].n_pixels == 12

    q = {r.media_id: r for r in
         mm.png_pixel_stats(media, with_quarantine=True).collect()}
    assert set(q) == {1, 2}            # non-PNG row 3 skipped, not poison
    assert q[1].ok and q[1].err is None
    assert not q[2].ok and q[2].err and q[2].width is None

    rz = mm.resize_png(media, 2, 2).collect()
    assert [r.media_id for r in rz] == [1]


def test_poison_wav_mp4_jpeg_quarantined(spark):
    wav_ok = mm.encode_wav(mm.keystream("q", 16), 8000, 1, 8)
    wav_bad = b"RIFF" + b"\x00" * 10          # truncated
    wav_compressed = bytearray(mm.encode_wav(mm.keystream("q", 16), 8000, 1, 8))
    i = wav_compressed.index(b"fmt ") + 8
    wav_compressed[i:i + 2] = (2).to_bytes(2, "little")  # non-PCM format
    media = spark.createDataFrame(
        [(1, wav_ok), (2, wav_bad), (3, bytes(wav_compressed))],
        "media_id long, content binary",
    )
    got = mm.wav_sample_stats(media).collect()
    assert [r.media_id for r in got] == [1]
    q = {r.media_id: r.ok for r in
         mm.wav_sample_stats(media, with_quarantine=True).collect()}
    assert q == {1: True, 2: False, 3: False}

    mp4_ok = mm.mp4_bytes(12, 1000, 320, 240)
    mp4_bad = mp4_ok[:20]                     # truncated mid-box
    m2 = spark.createDataFrame(
        [(1, mp4_ok), (2, mp4_bad)], "media_id long, content binary"
    )
    assert [r.media_id for r in m2.transform(mm.mp4_header_stats).collect()] == [1]
    qq = {r.media_id: r.ok for r in
          mm.mp4_header_stats(m2, with_quarantine=True).collect()}
    assert qq == {1: True, 2: False}

    jpg_ok = mm.jpeg_const_bytes(16, 8, seed=5)
    jpg_bad = b"\xff\xd8\xff\xe0" + b"\x00" * 8
    m3 = spark.createDataFrame(
        [(1, jpg_ok), (2, jpg_bad)], "media_id long, content binary"
    )
    assert [r.media_id for r in mm.jpeg_pixel_stats(m3).collect()] == [1]
    q3 = {r.media_id: r.ok for r in
          mm.jpeg_pixel_stats(m3, with_quarantine=True).collect()}
    assert q3 == {1: True, 2: False}


def test_wav_signal_features_numpy_reference(spark):
    """Zero crossings and energy must equal the direct numpy
    computation on the generator keystream (8-bit: centered at 128,
    strict sign flip), and a midline sample must break a run without
    counting as a crossing."""
    import numpy as np

    sm = np.frombuffer(mm.keystream("z", 64), dtype=np.uint8).astype(
        np.int64
    )
    c = sm - 128
    want_zc = int(((c[1:] * c[:-1]) < 0).sum())
    want_en = int((c * c).sum())
    media = spark.createDataFrame(
        [(7, mm.encode_wav(bytes(sm.astype(np.uint8)), 16000, 1, 8))],
        "media_id long, content binary",
    )
    got = mm.wav_signal_features(media).collect()
    assert len(got) == 1
    assert got[0].n_frames == 64
    assert got[0].zero_crossings == want_zc
    assert got[0].energy == want_en

    # hand-built: +1, -1, 128(=0 centered), -1, +1 → crossings only at
    # the strict flips (1↔-1); runs through the midline don't count
    hand = bytes([129, 127, 128, 127, 129])
    m2 = spark.createDataFrame(
        [(1, mm.encode_wav(hand, 8000, 1, 8))],
        "media_id long, content binary",
    )
    r = mm.wav_signal_features(m2).collect()[0]
    assert r.zero_crossings == 2          # 129→127 and 127→129
    assert r.energy == 4


def test_wav_signal_features_quarantine(spark):
    media = spark.createDataFrame(
        [(1, mm.encode_wav(mm.keystream("q", 16), 8000, 1, 8)),
         (2, b"RIFF" + b"\x00" * 10)],
        "media_id long, content binary",
    )
    assert [r.media_id for r in mm.wav_signal_features(media).collect()] == [1]
    q = {r.media_id: r.ok for r in
         mm.wav_signal_features(media, with_quarantine=True).collect()}
    assert q == {1: True, 2: False}


def test_png_ahash_perceptual_properties(spark):
    """aHash laws: deterministic per image; a half-dark/half-bright
    image hashes to exactly the bright half's bits; one slightly
    perturbed pixel moves the hash by at most a few bits (the
    near-dup property the fingerprint exists for)."""
    import numpy as np

    w = h = 16
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, 8:, :] = 200                      # right half bright
    base = mm.encode_png(bytes(img.reshape(-1)), w, h, 3)
    near = img.copy()
    near[3, 3, 0] = 40                       # tiny local change
    pert = mm.encode_png(bytes(near.reshape(-1)), w, h, 3)
    media = spark.createDataFrame(
        [(1, base), (2, base), (3, pert)], "media_id long, content binary"
    )
    got = {r.media_id: r for r in mm.png_ahash(media).collect()}
    a, b, c = got[1], got[2], got[3]
    assert (a.ahash_hi, a.ahash_lo) == (b.ahash_hi, b.ahash_lo)
    # right half of each 8-pixel row set → bits p where p%8 >= 4
    expect_bits = {p for p in range(64) if p % 8 >= 4}
    bits = {
        p for p in range(64)
        if ((a.ahash_hi >> (p - 32)) if p >= 32 else (a.ahash_lo >> p)) & 1
    }
    assert bits == expect_bits
    ham = bin(
        (a.ahash_hi ^ c.ahash_hi) << 32 | (a.ahash_lo ^ c.ahash_lo)
    ).count("1")
    assert ham <= 2


def test_gif_roundtrip_including_dict_reset():
    """LZW round-trips bit-exactly for every palette size, including
    an image large enough to grow the code width to 12 bits and force
    a dictionary reset (>4096 codes)."""
    import random

    from report_worker_spark.functions.multimodal import (
        decode_gif_pixels,
        encode_gif,
        gif_bytes,
        keystream,
    )

    for seed in range(12):
        w, h = seed % 13 + 4, seed % 11 + 4
        d = decode_gif_pixels(gif_bytes(w, h, seed))
        assert d["indices"] == bytes(
            x % 16 for x in keystream(f"{seed}:gifpix", w * h)
        )
        assert d["palette"] == keystream(f"{seed}:gifpal", 48)
    rng = random.Random(7)
    big = bytes(rng.randrange(16) for _ in range(120 * 90))
    assert (
        decode_gif_pixels(encode_gif(big, 120, 90, keystream("p", 48)))[
            "indices"
        ]
        == big
    )
    i256 = bytes(rng.randrange(256) for _ in range(60 * 50))
    assert (
        decode_gif_pixels(encode_gif(i256, 60, 50, keystream("q", 768)))[
            "indices"
        ]
        == i256
    )


def test_lzw_eoi_width_at_table_growth_boundary():
    """ADVICE r7: when the decoder's phantom entry after the final data
    code lands exactly on 2^width, it widens before reading EOI — the
    encoder must widen before writing it too, or a valid stream raises
    'truncated LZW stream (no EOI)' when EOI sits at the buffer end.
    The minimal repro plus an exhaustive sweep of short mcs=2 streams
    (which cross the 8→16-entry boundary in every alignment)."""
    from itertools import product

    from report_worker_spark.functions.multimodal import (
        _lzw_decode,
        _lzw_encode,
    )

    repro = bytes([3, 2, 2, 3, 3, 0, 1, 0, 0, 3, 1])
    assert _lzw_decode(_lzw_encode(repro, 2), 2, len(repro)) == repro
    for n in range(1, 7):
        for tup in product(range(4), repeat=n):
            b = bytes(tup)
            assert _lzw_decode(_lzw_encode(b, 2), 2, n) == b


def test_gif_strictness_raises():
    """Truncation at any point, interlace, and local color tables all
    raise (and therefore quarantine) instead of returning short."""
    import pytest

    from report_worker_spark.functions.multimodal import (
        decode_gif_pixels,
        gif_bytes,
    )

    full = gif_bytes(10, 10, 3)
    for cut in (5, 12, 20, len(full) // 2, len(full) - 1):
        with pytest.raises(ValueError):
            decode_gif_pixels(full[:cut])
    # flip the interlace / local-color-table bits in the descriptor
    desc_at = full.index(b"\x2c")
    for bit in (0x40, 0x80):
        mutated = bytearray(full)
        mutated[desc_at + 9] |= bit
        with pytest.raises(ValueError):
            decode_gif_pixels(bytes(mutated))


def test_gif_poison_quarantines_exactly(spark):
    """poison_inject's 12-byte truncation undershoots the 13-byte GIF
    screen descriptor, so poisoned == quarantined, same contract as
    the other four codecs."""
    import hashlib

    from pyspark.sql import functions as F

    from report_worker_spark.functions import multimodal as mm

    ids = spark.range(0, 120).select(F.col("id").alias("doc_id"))
    media = mm.synthetic_gif_media(ids, "doc_id")
    q = mm.gif_pixel_stats(mm.poison_inject(media, threshold=20000), True)
    got = {r.media_id for r in q.filter(~F.col("ok")).collect()}
    want = {
        i
        for i in range(120)
        if int(hashlib.md5(f"poison{i}".encode()).hexdigest()[:4], 16)
        < 20000
    }
    assert got == want and want


def test_bmp_roundtrip_and_strictness():
    """Encode→decode is the identity on the RGB buffer across padded
    (w*3 % 4 != 0) and unpadded widths; non-24bpp/compressed/truncated
    streams raise instead of partially decoding."""
    import struct

    import pytest

    for w, h, seed in [(2, 2, 0), (4, 3, 9), (5, 3, 7), (29, 19, 123)]:
        px = mm.keystream(f"{seed}:bmp", w * h * 3)
        enc = mm.encode_bmp(px, w, h)
        d = mm.decode_bmp_pixels(enc)
        assert (d["width"], d["height"], d["pixels"]) == (w, h, px)
    enc = mm.encode_bmp(mm.keystream("0:bmp", 4 * 2 * 3), 4, 2)
    with pytest.raises(ValueError):
        mm.decode_bmp_pixels(enc[:-1])          # truncated body
    with pytest.raises(ValueError):
        mm.decode_bmp_pixels(enc[:40])          # truncated header
    bad_bpp = enc[:28] + struct.pack("<H", 8) + enc[30:]
    with pytest.raises(ValueError):
        mm.decode_bmp_pixels(bad_bpp)           # paletted
    bad_comp = enc[:30] + struct.pack("<I", 1) + enc[34:]
    with pytest.raises(ValueError):
        mm.decode_bmp_pixels(bad_comp)          # RLE-compressed


def test_bmp_poison_quarantines_exactly(spark):
    """Corrupt BMPs quarantine per item; non-BMP rows are skipped."""
    ok = mm.bmp_bytes(4, 3, 1)
    rows = [(1, ok), (2, b"BM" + b"\x00" * 80), (3, b"not media")]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    good = mm.bmp_pixel_stats(media).collect()
    assert [r.media_id for r in good] == [1]
    assert good[0].n_pixels == 12
    q = {r.media_id: r for r in
         mm.bmp_pixel_stats(media, with_quarantine=True).collect()}
    assert set(q) == {1, 2}
    assert q[1].ok and not q[2].ok and q[2].err


def test_wav_rms_windows_numpy_reference(spark):
    """Window sums equal a numpy replica and concatenate back to the
    clip totals; ragged final window carries the remainder count."""
    import numpy as np

    rows = [(7, mm.wav_bytes(100, 16000, 7)), (8, mm.wav_bytes(64, 16000, 8))]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    got = {}
    for r in mm.wav_rms_windows(media, window=64).collect():
        got.setdefault(r.media_id, {})[r.win_id] = (
            r.n_in_win, r.sum_amp, r.sum_sq
        )
    for mid, nf in [(7, 100), (8, 64)]:
        sm = np.frombuffer(
            mm.keystream(f"{mid}:wav", nf), dtype=np.uint8
        ).astype(np.int64)
        nw = (nf + 63) // 64
        assert set(got[mid]) == set(range(nw))
        for w in range(nw):
            seg = sm[w * 64 : (w + 1) * 64]
            assert got[mid][w] == (
                len(seg), int(seg.sum()), int((seg * seg).sum())
            )


def test_mp4_frame_demux_roundtrip():
    """Writer → demuxer round-trip: every frame's payload equals its
    keystream, timestamps follow the constant stts delta, and the
    header-only walker still parses the frame-bearing container."""
    for mid in (0, 3, 12345, 89999):
        dur = mid % 90000 + 1000
        n, delta, sizes = mm.mp4_frame_plan(dur)
        b = mm.mp4_bytes_with_frames(dur, mid % 640 + 16, mid % 480 + 16, mid)
        d = mm.demux_mp4_frames(b)
        assert d["timescale"] == 1000 and d["n_frames"] == n
        for i, (idx, ts, payload) in enumerate(d["frames"]):
            assert idx == i and ts == i * delta
            assert payload == mm.keystream(f"{mid}:f{i}", sizes[i])
        hdr = mm.parse_mp4_header(b)
        assert hdr["duration_ms"] == dur
        assert hdr["width"] == mid % 640 + 16


def test_mp4_frame_demux_poison_is_loud():
    b = mm.mp4_bytes_with_frames(50_000, 64, 48, 9)
    with pytest.raises(ValueError):
        mm.demux_mp4_frames(b[:-5])  # truncated mdat
    with pytest.raises(ValueError):
        mm.demux_mp4_frames(b"\x00\x00\x00\x08ftyp")  # no moov
    # drop stco: corrupt the box type tag so the table goes missing
    with pytest.raises(ValueError):
        mm.demux_mp4_frames(b.replace(b"stco", b"xxco"))


def test_mp4_frame_stats_quarantine_and_sampling(spark):
    """One poison container yields ONE err row (never a task failure);
    every_ms keeps only the first frame per bucket."""
    good = mm.mp4_bytes_with_frames(50_000, 64, 48, 1)  # 7 frames
    bad = good[:-5]
    media = spark.createDataFrame(
        [(1, good), (2, bad)], "media_id long, content binary"
    )
    q = {
        r.media_id: r
        for r in mm.mp4_frame_stats(media, with_quarantine=True)
        .filter("NOT ok")
        .collect()
    }
    assert set(q) == {2} and q[2].err
    ok = mm.mp4_frame_stats(media).collect()
    assert sorted(r.frame_idx for r in ok) == list(range(7))
    n, delta, sizes = mm.mp4_frame_plan(50_000)
    by_idx = {r.frame_idx: r for r in ok}
    for i in range(n):
        assert by_idx[i].ts_ms == i * delta
        assert by_idx[i].n_bytes == sizes[i]
        assert by_idx[i].byte_sum == sum(mm.keystream(f"1:f{i}", sizes[i]))
    # sampling: bucket width 2·delta keeps every other frame
    sampled = mm.mp4_frame_stats(media, every_ms=2 * delta).collect()
    assert sorted(r.frame_idx for r in sampled) == [
        i for i in range(n) if i % 2 == 0
    ]


def test_mp4_frame_stats_under_structured_streaming(spark, tmp_path):
    """The demux kernel is a stateless mapInPandas, so it must run
    unchanged on a streaming source (multimodal ingestion at 100 TB is
    a stream of binary blobs): file-source stream → mp4_frame_stats →
    availableNow, results identical to the batch run."""
    ids = spark.range(40).select(F.col("id").alias("doc_id"))
    media = mm.synthetic_mp4_frame_media(ids, "doc_id")
    src = str(tmp_path / "media_src")
    media.write.parquet(src)
    stream = spark.readStream.schema(media.schema).parquet(src)
    out = mm.mp4_frame_stats(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("frame_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    await_finished(q)
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM frame_stream").collect())
    )
    expect = sorted(
        map(
            tuple,
            mm.mp4_frame_stats(spark.read.parquet(src)).collect(),
        )
    )
    assert got == expect and len(got) > 0


def test_mjpeg_frame_decode_matches_encoders(spark):
    """Demux + per-frame JPEG entropy decode reproduces the generator's
    block values exactly: sum_y = 64 · Σ keystream block bytes, dims
    from the per-frame formula, timestamps from the sample table."""
    ids = spark.range(12).select(F.col("id").alias("doc_id"))
    media = mm.synthetic_mjpeg_media(ids, "doc_id")
    rows = {
        (r["media_id"], r["frame_idx"]): r
        for r in mm.mjpeg_frame_pixel_stats(media).collect()
    }
    assert rows
    for mid in range(12):
        dur = mid % 90000 + 1000
        n, delta, _ = mm.mp4_frame_plan(dur)
        for fi in range(n):
            r = rows[(mid, fi)]
            w, h = mm.mjpeg_frame_dims(mid, fi)
            assert (r["width"], r["height"]) == (w, h)
            assert r["ts_ms"] == fi * delta
            blocks = mm.keystream(f"{mid}:f{fi}:jpg", (w // 8) * (h // 8))
            assert r["sum_y"] == 64 * sum(blocks)


def test_mjpeg_poison_frame_quarantines_per_frame(spark):
    """One corrupt frame payload inside a container must quarantine
    THAT frame only — siblings still decode, and the container-level
    demux row count is unchanged."""
    import pandas as pd

    dur = 25_000  # 4 frames
    n, _delta, _sizes = mm.mp4_frame_plan(dur)
    frames = [
        mm.jpeg_const_bytes(*mm.mjpeg_frame_dims(7, fi), f"7:f{fi}")
        for fi in range(n)
    ]
    frames[2] = frames[2][:10] + b"\x00garbage"  # truncated scan
    content = mm.mp4_bytes_with_frames(dur, 16, 16, 7, frames=frames)
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": [7], "kind": ["video"], "content": [content]})
    )
    got = mm.mjpeg_frame_pixel_stats(media, with_quarantine=True).collect()
    assert len(got) == n
    by_idx = {r["frame_idx"]: r for r in got}
    assert not by_idx[2]["ok"] and by_idx[2]["err"]
    for fi in (0, 1, 3):
        assert by_idx[fi]["ok"] and by_idx[fi]["sum_y"] is not None


def test_mp4_frames_param_must_match_plan():
    with pytest.raises(ValueError, match="frame count"):
        mm.mp4_bytes_with_frames(25_000, 16, 16, 1, frames=[b"x"])


def test_real_media_features_all_kinds_decode(spark):
    """The unified kind-dispatch decodes every row with the REAL codec
    for its kind, and val_sum equals the generator keystream sums."""
    ids = spark.range(9).select(F.col("id").alias("doc_id"))
    media = mm.synthetic_real_media(ids, "doc_id")
    got = {r["media_id"]: r for r in mm.real_media_features(media).collect()}
    assert len(got) == 9
    for mid in range(9):
        r = got[mid]
        if mid % 3 == 0:
            w, h = mid % 31 + 2, mid % 23 + 2
            assert r["kind"] == "image" and r["n_units"] == w * h
            assert r["val_sum"] == sum(mm.keystream(str(mid), w * h * 3))
        elif mid % 3 == 1:
            nf = mid % 96 + 32
            assert r["kind"] == "audio" and r["n_units"] == nf
            assert r["val_sum"] == sum(mm.keystream(f"{mid}:wav", nf))
        else:
            dur = mid % 90000 + 1000
            n, _d, sizes = mm.mp4_frame_plan(dur)
            assert r["kind"] == "video" and r["n_units"] == n
            assert r["val_sum"] == sum(
                sum(mm.keystream(f"{mid}:f{i}", s))
                for i, s in enumerate(sizes)
            )


def test_real_media_features_mjpeg_decoder_closes_seam(spark):
    """Passing decode_jpeg_pixels as the video frame decoder runs the
    real codec over each demuxed payload — val_sum becomes decoded
    luma, matching the per-frame MJPEG stats exactly."""
    ids = spark.range(6).select(F.col("id").alias("doc_id"))
    media = mm.synthetic_mjpeg_media(ids, "doc_id")
    uni = {
        r["media_id"]: r["val_sum"]
        for r in mm.real_media_features(
            media, video_frame_decoder=mm.decode_jpeg_pixels
        ).collect()
    }
    per_frame = (
        mm.mjpeg_frame_pixel_stats(media)
        .groupBy("media_id")
        .agg(F.sum("sum_y").alias("s"))
        .collect()
    )
    assert uni == {r["media_id"]: r["s"] for r in per_frame} and len(uni) == 6


def test_mjpeg_non_bmff_container_quarantines_not_vanishes(spark):
    """A container whose leading box isn't ftyp is POISON for an MJPEG
    table (code-review r14): it must surface as an err row, never
    silently disappear from both streams."""
    import pandas as pd

    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1, 2],
                "kind": ["video", "video"],
                "content": [
                    b"\x00\x00\x00\x08junk",
                    mm.mp4_bytes_with_frames(25_000, 16, 16, 2),
                ],
            }
        )
    )
    got = {
        r["media_id"]: r
        for r in mm.mjpeg_frame_pixel_stats(media, with_quarantine=True)
        .groupBy("media_id")
        .agg(
            F.max(F.col("ok").cast("int")).alias("any_ok"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert got[1]["any_ok"] == 0 and got[1]["n"] == 1  # err row, present
    # valid container: frames demux (payloads aren't JPEG -> per-frame err)
    assert got[2]["n"] > 1


def test_media_quarantine_rates_fused_matches_unfused(spark):
    """r14: media_quarantine_rates fuses gen→poison→decode into one
    kernel. Pin it row-for-row against the UNFUSED composition it
    replaced (poison_inject + the three standalone quarantined
    decodes over the same 2·id / id / 2·id+1 media tables)."""
    docs = spark.range(0, 60).select(F.col("id").alias("doc_id"))

    fused = {
        r["kind"]: (r["n_items"], r["n_quarantined"], r["quarantine_rate"])
        for r in mm.media_quarantine_rates(docs).collect()
    }

    png_m = mm.synthetic_image_media(
        docs.select((F.col("doc_id") * 2).alias("doc_id")), "doc_id"
    )
    wav_m = mm.synthetic_wav_media(docs, "doc_id")
    mp4_m = mm.synthetic_mp4_media(
        docs.select((F.col("doc_id") * 2 + 1).alias("doc_id")), "doc_id"
    )
    for kind, decoded in [
        ("png", mm.png_pixel_stats(mm.poison_inject(png_m), True)),
        ("audio", mm.wav_sample_stats(mm.poison_inject(wav_m), True)),
        ("video", mm.mp4_header_stats(mm.poison_inject(mp4_m), True)),
    ]:
        rows = decoded.collect()
        n = len(rows)
        q = sum(0 if r["ok"] else 1 for r in rows)
        assert fused[kind] == (n, q, q / n), kind
    # the fixture must actually exercise the quarantine path
    assert sum(v[1] for v in fused.values()) > 0


def test_poison_python_twin(spark):
    """The fused kernel computes the poison draw with hashlib; pin it
    against poison_inject's JVM md5 expression on the same ids."""
    import hashlib

    ids = list(range(0, 400))
    media = spark.createDataFrame(
        [(i, b"x" * 20) for i in ids], "media_id long, content binary"
    )
    jvm_poisoned = {
        r["media_id"]
        for r in mm.poison_inject(media).collect()
        if len(r["content"]) == 12
    }
    py_poisoned = {
        i
        for i in ids
        if int(hashlib.md5(f"poison{i}".encode()).hexdigest()[:4], 16)
        < 6554
    }
    assert jvm_poisoned == py_poisoned and py_poisoned
