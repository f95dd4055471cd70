"""Structured Streaming front-end for the 1m tier.

The batch reference is batch-only (SURVEY.md §2.10); this is the engine's
forward path: a streaming source of transcript turns feeds the SAME 1m
continuous aggregate (per-bucket per-state counts) through tumbling
``window()`` aggregation with a watermark bounding turn lateness. The sink
is an append-mode parquet tier directory compatible with the batch cascade's
1m table (the 1h/1d merges are source-agnostic — algebraic re-merges don't
care whether 1m rows came from batch or stream).

Tested with the file source + ``Trigger.AvailableNow`` (deterministic, no
wall-clock dependence); in production the source is Kafka/Iceberg CDC and
the trigger is processingTime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_state_counts_1m(
    turns_stream: DataFrame,
    watermark: str = "10 minutes",
    state_col: str = "role",
    ts_col: str = "ts",
    salt_buckets: int = 32,
) -> DataFrame:
    """Streaming per-(conv_bucket, 1m window, state) counts.

    Watermark = max tolerated turn lateness: a 1m bucket finalizes once the
    event-time high-water mark passes bucket_end + watermark, at which point
    the append-mode sink emits exactly one immutable row per key — the same
    algebraic shape the batch cascade writes."""
    w = F.window(F.col(ts_col), "1 minute")
    return (
        turns_stream.withWatermark(ts_col, watermark)
        .filter(F.col(state_col).isNotNull())
        .groupBy(
            F.pmod(F.xxhash64(F.col("conv_id")), F.lit(salt_buckets))
            .cast("int")
            .alias("conv_bucket"),
            w,
            F.col(state_col).alias("state"),
        )
        .agg(F.count(F.lit(1)).alias("n_turns"), F.sum(F.lit(1.0)).alias("w_sum"))
        .select(
            "conv_bucket",
            F.col("window.start").alias("time_bucket"),
            "state",
            "n_turns",
            "w_sum",
        )
    )
