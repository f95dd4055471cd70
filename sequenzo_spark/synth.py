"""Deterministic synthetic transcript generator — pure Spark, no external data.

Generates the BASELINE.json input_hint table
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` fully distributed: ``spark.range`` → hash-derived pseudo-random
draws (xxhash64 of (conv, turn, seed)), so the same (n_convs, seed) always
yields bit-identical data at any parallelism level, and generation scales
linearly with cores (no driver-side loops, no numpy on the driver).

Shape mirrors FIXTURES.md §1: skewed conversation lengths (most 5–50 turns)
plus one giant conversation (conv_id '0') for skew tests; ``ts`` strictly
increasing within a conversation; ``role`` follows a plausible
user/assistant/tool/system turn structure; ``text`` is an opaque deterministic
payload whose per-turn equality is the engine's carry-through invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _h(seed: int, *cols) -> F.Column:
    """Deterministic non-negative 63-bit hash of (seed, *cols)."""
    return F.abs(F.xxhash64(F.lit(seed), *cols))


def generate_transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    seed: int = 42,
    giant_conv_turns: int = 0,
    base_ts: str = "2024-01-01 00:00:00",
    partitions: int | None = None,
) -> DataFrame:
    """Return a deterministic transcripts DataFrame (TRANSCRIPT_SCHEMA).

    ``giant_conv_turns`` > 0 makes conv '0' that long (skew fixture).
    """
    convs = spark.range(n_convs).select(F.col("id").alias("cid"))
    if partitions:
        convs = convs.repartition(partitions, "cid")

    # Skewed length: 5 + h%46 turns (5..50); conv 0 optionally giant.
    ln = (F.lit(5) + _h(seed, F.col("cid"), F.lit("len")) % 46).cast("int")
    if giant_conv_turns > 0:
        ln = F.when(F.col("cid") == 0, F.lit(giant_conv_turns)).otherwise(ln)
    convs = convs.withColumn("n_turns", ln)

    turns = convs.select(
        F.concat(F.lit("conv-"), F.col("cid")).alias("conv_id"),
        F.col("cid"),
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    h_role = _h(seed, "cid", "turn_idx", F.lit("role")) % 100
    # turn 0 always user; then mostly alternating user/assistant with
    # tool (18%) and system (4%) interleaves — a plausible agent transcript.
    role = (
        F.when(F.col("turn_idx") == 0, F.lit("user"))
        .when(h_role < 4, F.lit("system"))
        .when(h_role < 22, F.lit("tool"))
        .when(F.col("turn_idx") % 2 == 1, F.lit("assistant"))
        .otherwise(F.lit("user"))
    )
    h_tool = _h(seed, "cid", "turn_idx", F.lit("tool")) % 4
    tool = F.when(
        role == "tool",
        F.element_at(
            F.array(F.lit("bash"), F.lit("search"), F.lit("edit"), F.lit("none")),
            (h_tool + 1).cast("int"),
        ),
    ).otherwise(F.lit(None).cast("string"))

    # Strictly increasing ts: conv start staggered by cid, then a cumulative
    # sum of per-turn gaps (1..180 s). Window is partition-local after the
    # repartition by cid — no extra shuffle.
    gap = (F.lit(1) + _h(seed, "cid", "turn_idx", F.lit("gap")) % 180).cast("long")
    w = Window.partitionBy("cid").orderBy("turn_idx")
    offset = F.sum(gap).over(w)
    start = F.to_timestamp(F.lit(base_ts))
    ts = F.timestamp_seconds(
        F.unix_timestamp(start) + (F.col("cid") % 86400) * 7 + offset
    )

    text = F.concat(
        F.lit("msg-"),
        F.conv(F.hex(_h(seed, "cid", "turn_idx", F.lit("text"))), 16, 36),
    )

    return turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )
