"""Streaming 1m tier == batch 1m tier on the same input (availableNow file
source, deterministic)."""

from pyspark.sql import functions as F

from sequenzo_spark.rollup.aggregates import rollup_state_counts, with_conv_bucket
from sequenzo_spark.schema import TRANSCRIPT_SCHEMA
from sequenzo_spark.streaming.rollup_stream import streaming_state_counts_1m
from sequenzo_spark.synth import generate_transcripts

SALT = 4


def test_streaming_matches_batch_1m(spark, tmp_path):
    src = str(tmp_path / "turns")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    raw = generate_transcripts(spark, n_convs=30, seed=5)
    raw.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src)
    agg = streaming_state_counts_1m(stream, salt_buckets=SALT, state_col="role")
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    want = rollup_state_counts(
        with_conv_bucket(raw, buckets=SALT).withColumn("state", F.col("role")),
        "1m",
    )
    # append mode only emits windows closed by the watermark; the tail of
    # the stream stays in state. Compare on the emitted keys.
    emitted = {
        (r.conv_bucket, r.time_bucket, r.state): (r.n_turns, r.w_sum)
        for r in got.collect()
    }
    expected = {
        (r.conv_bucket, r.time_bucket, r.state): (r.n_turns, r.w_sum)
        for r in want.collect()
    }
    assert len(emitted) > 0
    for k, v in emitted.items():
        assert expected[k] == v, k
    # coverage: the watermark tail is bounded (≤ watermark span of buckets)
    assert len(emitted) >= len(expected) * 0.5
