"""Multimodal plumbing: schema contract, deterministic fake payloads, Arrow
mapInPandas feature extraction, stubbed real-decode path."""

import pytest
from pyspark.sql import functions as F

from sequenzo_spark.pipeline.multimodal import (
    attach_fake_media,
    decode_image,
    extract_image_features,
    frame_sample_plan,
)


def test_attach_and_extract_features(spark):
    docs = spark.range(50).select(F.col("id").alias("doc_id"))
    media = attach_fake_media(docs, "doc_id", name="image", payload_bytes=128)
    assert dict(media.dtypes)["image_bytes"] == "binary"
    assert "format:string" in dict(media.dtypes)["image_meta"].replace(" ", "")

    feats = extract_image_features(media, "doc_id", name="image")
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        assert 0.0 <= r.mean_r <= 255.0
        assert r.std_all >= 0.0

    # determinism across partitioning (distributed, hash-derived payloads)
    feats2 = extract_image_features(
        attach_fake_media(docs.repartition(7), "doc_id", payload_bytes=128),
        "doc_id",
    )
    a = {r.doc_id: (r.mean_r, r.content_hash) for r in rows}
    b = {r.doc_id: (r.mean_r, r.content_hash) for r in feats2.collect()}
    assert a == b


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError, match="image library"):
        decode_image(b"\x00" * 16, {"width": 4, "height": 4}, fake=False)


def test_fake_decode_shape():
    img = decode_image(b"\x01\x02\x03" * 50, {"width": 5, "height": 4}, fake=True)
    assert img.shape == (4, 5, 3)
    assert img.dtype.name == "uint8"


def test_frame_sample_plan(spark):
    vids = spark.range(3).select(F.col("id").alias("vid_id"))
    media = attach_fake_media(vids, "vid_id", name="video")
    media = media.withColumn(
        "video_meta",
        F.struct(
            F.lit("fake/v").alias("format"),
            F.lit(8).cast("int").alias("width"),
            F.lit(8).cast("int").alias("height"),
            F.lit(25).cast("int").alias("n_frames"),
            F.lit(None).cast("int").alias("sample_rate"),
        ),
    )
    plan = frame_sample_plan(media, name="video", every_n=10)
    got = sorted(
        (r.vid_id, r.frame_idx) for r in plan.select("vid_id", "frame_idx").collect()
    )
    assert got == sorted((v, f) for v in range(3) for f in (0, 10, 20))
