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


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(img: np.ndarray) -> bytes:
    """Encode an HxWx3 uint8 array as a minimal non-interlaced RGB8 PNG —
    stdlib only (zlib + struct): IHDR / one IDAT (filter 0 rows) / IEND."""
    import struct
    import zlib

    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_png expects HxWx3 uint8")
    hgt, w, _ = img.shape

    def chunk(typ: bytes, data: bytes) -> bytes:
        body = typ + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, hgt, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(hgt))
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _png_decode(payload: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit RGB (color type 2) or RGBA (6) PNG
    with stdlib zlib + NumPy — no image library. All five row filters
    (None/Sub/Up/Average/Paeth) are unfiltered per the PNG spec; RGBA
    drops alpha so the HxWx3 contract of decode_image holds. Sub uses a
    per-channel cumulative sum (mod-256 uint8 wrap); Average/Paeth carry a
    left-to-right pixel loop — rows are short and mapInPandas batches
    bound the Python time."""
    import struct
    import zlib

    pos, idat, ihdr = 8, [], None
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("malformed PNG: missing IHDR/IDAT")
    w, hgt, depth, color_type, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8 or color_type not in (2, 6) or interlace != 0:
        raise NotImplementedError(
            "stdlib PNG decoder handles non-interlaced 8-bit RGB/RGBA only "
            f"(got depth={depth}, color_type={color_type}, "
            f"interlace={interlace})"
        )
    ch = 3 if color_type == 2 else 4
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != hgt * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.empty((hgt, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(hgt):
        off = r * (stride + 1)
        ftype = raw[off]
        row = np.frombuffer(raw, np.uint8, stride, off + 1).copy()
        if ftype == 0:  # None
            recon = row
        elif ftype == 1:  # Sub: left dependency → per-channel cumsum mod 256
            recon = (
                np.cumsum(row.reshape(w, ch), axis=0, dtype=np.uint64) % 256
            ).astype(np.uint8).reshape(stride)
        elif ftype == 2:  # Up
            recon = row + prev  # uint8 wraps mod 256
        elif ftype in (3, 4):  # Average / Paeth: sequential left+up
            recon = np.empty(stride, dtype=np.uint8)
            ri = row.astype(np.int32)
            pi = prev.astype(np.int32)
            rc = recon  # alias
            for x in range(stride):
                left = int(rc[x - ch]) if x >= ch else 0
                up = int(pi[x])
                if ftype == 3:
                    pred = (left + up) // 2
                else:
                    ul = int(pi[x - ch]) if x >= ch else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = (
                        left
                        if (pa <= pb and pa <= pc)
                        else (up if pb <= pc else ul)
                    )
                rc[x] = (ri[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[r] = recon
        prev = recon
    return out.reshape(hgt, w, ch)[:, :, :3].copy()


def decode_image(payload: bytes, meta: dict, fake: bool = False) -> np.ndarray:
    """Decode one image payload to an HxWx3 uint8 array.

    Real paths: binary PPM (P6) via pure NumPy (header parse + frombuffer),
    and non-interlaced 8-bit RGB/RGBA PNG via the stdlib zlib decoder
    (_png_decode — all five row filters). JPEG and other codecs would need
    Pillow, absent in this container, and raise NotImplementedError.
    ``fake=True`` keeps the deterministic pseudo-decode (payload bytes
    tiled to the metadata shape) used by plumbing tests."""
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
    if payload[:8] == PNG_SIG:
        return _png_decode(payload)
    raise NotImplementedError(
        "binary PPM (P6) and non-interlaced RGB8 PNG decode without an "
        "image library; JPEG needs Pillow, not available in this environment"
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


def attach_png_media(
    df: DataFrame,
    id_col: str,
    name: str = "image",
    seed: int = 42,
    max_side: int = 24,
) -> DataFrame:
    """Attach REAL compressed image payloads: deterministic per-id pixels
    encoded as non-interlaced RGB8 PNG via ``encode_png`` (stdlib zlib) —
    the compressed-codec sibling of :func:`attach_ppm_media`, same
    mapInPandas distribution shape."""
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
                        encode_png(img),
                        {
                            "format": "image/png",
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
                # zip over column arrays, not .iterrows(): iterrows builds
                # a pandas Series per row (~10× the per-row overhead of the
                # scalar decode's bookkeeping); values identical (guide §4.2
                # — keep the Python loop lean around the inherent per-image
                # decode)
                for rid, rb, rmeta in zip(
                    chunk[id_col].to_numpy(),
                    chunk[bcol].to_numpy(),
                    chunk[mcol].to_numpy(),
                ):
                    img = decode_image(rb, rmeta, fake=fake_decode)
                    rows.append(
                        (
                            rid,
                            float(img[:, :, 0].mean()),
                            float(img[:, :, 1].mean()),
                            float(img[:, :, 2].mean()),
                            float(img.std()),
                            int(
                                np.int64(
                                    int.from_bytes(
                                        bytes(rb)[:8], "big", signed=True
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
