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


def test_ppm_roundtrip_and_real_decode(spark):
    """Real (non-fake) decode path: synthesize binary PPM payloads, decode
    them end-to-end through mapInPandas, and verify channel means against a
    local decode of the same deterministic bytes."""
    import numpy as np

    from sequenzo_spark.pipeline.multimodal import (
        attach_ppm_media,
        decode_image,
        encode_ppm,
        extract_image_features,
    )

    # pure round-trip
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    assert (decode_image(encode_ppm(img), {}) == img).all()

    ids = spark.range(0, 20).withColumnRenamed("id", "doc_id")
    media = attach_ppm_media(ids, "doc_id", seed=11)
    feats = {
        r["doc_id"]: r
        for r in extract_image_features(
            media, "doc_id", fake_decode=False
        ).collect()
    }
    assert len(feats) == 20
    # cross-check one row against a local regeneration of the same payload
    rng = np.random.default_rng((3 * 2654435761 + 11) % 2**63)
    w = int(rng.integers(8, 25)); hgt = int(rng.integers(8, 25))
    expect = rng.integers(0, 256, size=(hgt, w, 3), dtype=np.uint8)
    assert feats[3]["mean_r"] == float(expect[:, :, 0].mean())
    assert feats[3]["mean_g"] == float(expect[:, :, 1].mean())


def test_decode_image_unknown_codec_raises(spark):
    import pytest

    from sequenzo_spark.pipeline.multimodal import decode_image

    # JPEG (SOI marker) stays honestly stubbed — needs Pillow
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 16, {})
    # a PNG signature with garbage chunks is malformed, not unsupported
    with pytest.raises(ValueError, match="malformed PNG"):
        decode_image(b"\x89PNG\r\n\x1a\n....", {})


def test_png_roundtrip():
    import numpy as np

    from sequenzo_spark.pipeline.multimodal import decode_image, encode_png

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(13, 9, 3), dtype=np.uint8)
    out = decode_image(encode_png(img), {}, fake=False)
    assert out.shape == (13, 9, 3)
    assert (out == img).all()


def test_png_all_filters_unfilter_correctly():
    """Build a PNG whose rows use every filter type (0..4), filtered by an
    independent pure-Python reference filterer, and assert the decoder
    reconstructs the original pixels."""
    import struct
    import zlib

    import numpy as np

    from sequenzo_spark.pipeline.multimodal import PNG_SIG, _png_decode

    rng = np.random.default_rng(9)
    w, h, ch = 7, 5, 3
    img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)

    def ref_filter(ftype, row, prev):
        out = bytearray()
        for x in range(len(row)):
            left = row[x - ch] if x >= ch else 0
            up = prev[x]
            ul = prev[x - ch] if x >= ch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) // 2
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            out.append((int(row[x]) - pred) % 256)
        return bytes(out)

    raw = bytearray()
    prev = [0] * (w * ch)
    for r in range(h):
        ftype = r % 5
        row = [int(v) for v in img[r].reshape(-1)]
        raw.append(ftype)
        raw += ref_filter(ftype, row, prev)
        prev = row

    def chunk(typ, data):
        body = typ + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    payload = (
        PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert (_png_decode(payload) == img).all()


def test_png_rgba_drops_alpha():
    import struct
    import zlib

    import numpy as np

    from sequenzo_spark.pipeline.multimodal import PNG_SIG, _png_decode

    rng = np.random.default_rng(3)
    w, h = 4, 3
    rgba = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)

    def chunk(typ, data):
        body = typ + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + rgba[r].tobytes() for r in range(h))
    payload = (
        PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert (_png_decode(payload) == rgba[:, :, :3]).all()


def test_png_end_to_end_features(spark):
    """attach_png_media → extract_image_features with the REAL decoder:
    per-image channel means must equal the deterministic source pixels'."""
    import numpy as np

    from sequenzo_spark.pipeline.multimodal import (
        attach_png_media,
        extract_image_features,
    )

    ids = spark.range(6).select(F.col("id").cast("long").alias("doc_id"))
    media = attach_png_media(ids, "doc_id", seed=42, max_side=16)
    feats = {
        r["doc_id"]: r
        for r in extract_image_features(
            media, "doc_id", fake_decode=False
        ).collect()
    }
    assert len(feats) == 6
    for v in range(6):
        rng = np.random.default_rng((v * 2654435761 + 42) % 2**63)
        w = int(rng.integers(8, 17))
        hgt = int(rng.integers(8, 17))
        img = rng.integers(0, 256, size=(hgt, w, 3), dtype=np.uint8)
        assert feats[v]["mean_r"] == pytest.approx(float(img[:, :, 0].mean()))
        assert feats[v]["mean_g"] == pytest.approx(float(img[:, :, 1].mean()))
        assert feats[v]["mean_b"] == pytest.approx(float(img[:, :, 2].mean()))
