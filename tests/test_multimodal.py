from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from report_worker_spark.functions import multimodal as mm
from report_worker_spark.plans.tables import load


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
