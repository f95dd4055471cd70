"""Multimodal columns — image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested: schema contract, deterministic
synthetic payload generation, Arrow-batched ``mapInPandas`` transforms with
bounded batch memory, and partition-count preservation. The actual media
decoding is STUBBED — the sandbox ships no image/audio libraries — behind
``decode_image``, which raises ``NotImplementedError`` unless
``fake=True`` (a deterministic fake decoder used by tests: payload bytes →
seeded pseudo-pixel statistics).

Schema contract for a media column set:
  {name}_bytes  binary      opaque payload
  {name}_meta   struct<format string, width int, height int, n_frames int,
                        sample_rate int>   typed metadata (NULL fields where
                                           inapplicable)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_META_DDL = (
    "struct<format:string,width:int,height:int,n_frames:int,sample_rate:int>"
)


def attach_fake_media(
    df: DataFrame,
    id_col: str,
    name: str = "image",
    seed: int = 42,
    payload_bytes: int = 256,
) -> DataFrame:
    """Deterministically synthesize an opaque binary payload + metadata per
    row (hash-derived, distributed — the test stand-in for real media)."""
    h = F.abs(F.xxhash64(F.col(id_col), F.lit(seed)))
    # payload: repeat the 16-hex-char hash enough times, cut to size
    reps = (payload_bytes * 2) // 16 + 1
    payload = F.unhex(F.substring(F.repeat(F.hex(h), reps), 1, payload_bytes * 2))
    meta = F.struct(
        F.lit("fake/rgb8").alias("format"),
        (F.lit(8) + (h % 56)).cast("int").alias("width"),
        (F.lit(8) + ((h / F.lit(57)) % 56)).cast("int").alias("height"),
        F.lit(1).cast("int").alias("n_frames"),
        F.lit(None).cast("int").alias("sample_rate"),
    )
    return df.withColumn(f"{name}_bytes", payload).withColumn(f"{name}_meta", meta)


def encode_ppm(img: np.ndarray) -> bytes:
    """Encode an HxWx3 uint8 array as binary PPM (P6) — pure NumPy/bytes,
    no image library. P6 spec: ASCII header 'P6\\n<w> <h>\\n<maxval>\\n'
    followed by raw RGB bytes row-major."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_ppm expects HxWx3 uint8")
    hgt, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, hgt) + img.tobytes()


def decode_image(payload: bytes, meta: dict, fake: bool = False) -> np.ndarray:
    """Decode one image payload to an HxWx3 uint8 array.

    Real path: binary PPM (P6) is decoded with pure NumPy (header parse +
    frombuffer) — no external image library needed. Compressed codecs
    (PNG/JPEG/…) would need Pillow, absent in this container, and raise
    NotImplementedError. ``fake=True`` keeps the deterministic pseudo-decode
    (payload bytes tiled to the metadata shape) used by plumbing tests."""
    if fake:
        w, hgt = int(meta["width"]), int(meta["height"])
        buf = np.frombuffer(payload, dtype=np.uint8)
        need = w * hgt * 3
        tiled = np.resize(buf, need)
        return tiled.reshape(hgt, w, 3)
    payload = bytes(payload)
    if payload[:2] == b"P6":
        import re

        m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", payload)
        if not m:
            raise ValueError("malformed PPM header")
        w, hgt = int(m.group(1)), int(m.group(2))
        arr = np.frombuffer(
            payload, dtype=np.uint8, count=w * hgt * 3, offset=m.end()
        )
        return arr.reshape(hgt, w, 3).copy()
    raise NotImplementedError(
        "only binary PPM (P6) decodes without an image library; "
        "PNG/JPEG need Pillow, not available in this environment"
    )


def attach_ppm_media(
    df: DataFrame,
    id_col: str,
    name: str = "image",
    seed: int = 42,
    max_side: int = 24,
) -> DataFrame:
    """Attach REAL image payloads: deterministic per-id pseudo-random pixels
    encoded as binary PPM (P6) via ``encode_ppm``. mapInPandas so the bytes
    are built worker-side in Arrow batches — the same distribution shape a
    real ingest of image files would have."""
    from sequenzo_spark import ensure_workers_can_import

    ensure_workers_can_import(df.sparkSession)
    id_type = next(
        f.dataType.simpleString() for f in df.schema if f.name == id_col
    )
    schema = f"{id_col} {id_type}, {name}_bytes binary, {name}_meta {MEDIA_META_DDL}"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for v in pdf[id_col]:
                rng = np.random.default_rng((int(v) * 2654435761 + seed) % 2**63)
                w = int(rng.integers(8, max_side + 1))
                hgt = int(rng.integers(8, max_side + 1))
                img = rng.integers(0, 256, size=(hgt, w, 3), dtype=np.uint8)
                out.append(
                    (
                        v,
                        encode_ppm(img),
                        {
                            "format": "image/x-portable-pixmap",
                            "width": w,
                            "height": hgt,
                            "n_frames": 1,
                            "sample_rate": None,
                        },
                    )
                )
            yield pd.DataFrame(
                out, columns=[id_col, f"{name}_bytes", f"{name}_meta"]
            )

    return df.select(id_col).mapInPandas(gen, schema=schema)


def extract_image_features(
    df: DataFrame,
    id_col: str,
    name: str = "image",
    fake_decode: bool = True,
    batch_rows: int = 1024,
) -> DataFrame:
    """mapInPandas feature extraction: per image, decode (stub/fake) and
    emit channel means/stds + a content hash. Arrow batches bound memory;
    binary payloads never pass through Python row objects."""
    from sequenzo_spark import ensure_workers_can_import

    ensure_workers_can_import(df.sparkSession)

    id_type = next(
        f.dataType.simpleString() for f in df.schema if f.name == id_col
    )
    schema = (
        f"{id_col} {id_type}, mean_r double, mean_g double, mean_b double, "
        "std_all double, content_hash long"
    )
    bcol, mcol = f"{name}_bytes", f"{name}_meta"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                rows = []
                for _, r in chunk.iterrows():
                    img = decode_image(r[bcol], r[mcol], fake=fake_decode)
                    rows.append(
                        (
                            r[id_col],
                            float(img[:, :, 0].mean()),
                            float(img[:, :, 1].mean()),
                            float(img[:, :, 2].mean()),
                            float(img.std()),
                            int(
                                np.int64(
                                    int.from_bytes(
                                        bytes(r[bcol])[:8], "big", signed=True
                                    )
                                )
                            ),
                        )
                    )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        id_col,
                        "mean_r",
                        "mean_g",
                        "mean_b",
                        "std_all",
                        "content_hash",
                    ],
                )

    return df.select(id_col, bcol, mcol).mapInPandas(run, schema=schema)


def frame_sample_plan(
    df: DataFrame, name: str = "video", every_n: int = 10
) -> DataFrame:
    """Frame-sampling plumbing for video columns: expands metadata into a
    frame-index plan (explode of sequence — no decode). The decode of
    selected frames plugs into the same mapInPandas contract as images."""
    meta = F.col(f"{name}_meta")
    idx = F.sequence(
        F.lit(0), F.greatest(meta["n_frames"] - 1, F.lit(0)), F.lit(every_n)
    )
    return df.withColumn("frame_idx", F.explode(idx))
