"""Gorilla applyInPandas integration: compress tier points → chunk rows →
decompress → bit-exact identity, at two parallelism levels."""

import numpy as np
from pyspark.sql import functions as F

from sequenzo_spark.compression.gorilla import (
    gorilla_compress_chunks,
    gorilla_decompress_chunks,
)
from sequenzo_spark.synth import generate_transcripts


def _series(spark):
    """Per (state, minute) turn counts from synthetic transcripts — the
    engine's real 1m-tier shape."""
    t = generate_transcripts(spark, n_convs=50, seed=11)
    return (
        t.groupBy(
            F.col("role").alias("series_key"),
            F.date_trunc("minute", "ts").alias("ts"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("value"))
        .withColumn("chunk_day", F.date_trunc("day", "ts"))
    )


def test_chunk_roundtrip_bit_exact(spark):
    pts = _series(spark).cache()
    chunks = gorilla_compress_chunks(
        pts, key_cols=["series_key", "chunk_day"], ts_col="ts", value_col="value"
    ).cache()
    n_chunks = chunks.count()
    assert n_chunks >= 4
    # compression must actually compress on this regular-ish series
    tot = chunks.agg(F.sum("raw_bytes"), F.sum("enc_bytes")).first()
    assert tot[1] < tot[0] / 2, f"enc {tot[1]} vs raw {tot[0]}"

    back = gorilla_decompress_chunks(
        chunks, key_cols=["series_key", "chunk_day"], value_col="value"
    )
    a = (
        pts.select("series_key", "ts", "value")
        .toPandas()
        .sort_values(["series_key", "ts"])
        .reset_index(drop=True)
    )
    b = (
        back.select("series_key", "ts", "value")
        .toPandas()
        .sort_values(["series_key", "ts"])
        .reset_index(drop=True)
    )
    assert len(a) == len(b)
    assert (a["series_key"].values == b["series_key"].values).all()
    assert (
        a["ts"].astype("datetime64[us]").values
        == b["ts"].astype("datetime64[us]").values
    ).all()
    np.testing.assert_array_equal(
        a["value"].to_numpy().view(np.uint64),
        b["value"].to_numpy().view(np.uint64),
    )


def test_chunks_deterministic_across_partitioning(spark):
    """Same input, different partitioning → identical encoded blobs
    (the in-group sort removes shuffle-order dependence)."""
    pts = _series(spark)
    c1 = gorilla_compress_chunks(
        pts.repartition(2), ["series_key", "chunk_day"], "ts", "value"
    )
    c2 = gorilla_compress_chunks(
        pts.repartition(16), ["series_key", "chunk_day"], "ts", "value"
    )
    a = {
        (r.series_key, r.chunk_day): (bytes(r.ts_blob), bytes(r.val_blob))
        for r in c1.collect()
    }
    b = {
        (r.series_key, r.chunk_day): (bytes(r.ts_blob), bytes(r.val_blob))
        for r in c2.collect()
    }
    assert a == b
