"""Gap-fill over missing time buckets — LOCF and linear interpolation.

The reference's gap-fill precedents: forward-fill of missing states before
run detection (seqdss.pyx:19-21, seqdur.pyx:19-20) and NA-padded shifts
(sequence_operations/operations.py:115-125). The rollup engine generalizes
them to the time axis: a series with absent buckets is densified onto the
tumbling-bucket grid, then each hole is filled by LOCF (carry the last
observation) or by linear interpolation between the bracketing anchors.

All window passes are partition-local per series key (one shuffle). The grid
is generated with ``sequence()`` + ``explode`` per key (distributed, never on
the driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def densify(
    df: DataFrame,
    key_cols: list[str],
    bucket_col: str = "time_bucket",
    step_seconds: int = 60,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Expand each key's series onto the dense bucket grid between its min and
    max bucket; absent buckets appear with NULL values and is_gap=true."""
    value_cols = value_cols or [
        c for c in df.columns if c not in key_cols + [bucket_col]
    ]
    step = F.expr(f"INTERVAL {step_seconds} SECONDS")
    grid = (
        df.groupBy(*key_cols)
        .agg(F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi"))
        .select(
            *key_cols,
            F.explode(F.sequence(F.col("_lo"), F.col("_hi"), step)).alias(bucket_col),
        )
    )
    joined = grid.join(df, key_cols + [bucket_col], "left")
    probe = value_cols[0]
    return joined.withColumn("is_gap", F.col(probe).isNull())


def fill_gaps(
    df: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    bucket_col: str = "time_bucket",
    step_seconds: int = 60,
    method: str = "locf",
) -> DataFrame:
    """Densify + fill. ``method`` ∈ {"locf", "linear"}.

    LOCF: last(ignorenulls) over unbounded-preceding — identical mechanism to
    :func:`sequenzo_spark.operators.spells.locf_fill`, applied to bucket rows.
    Linear: for a hole at t between anchors (t0,v0) and (t1,v1):
    v = v0 + (v1−v0) · (t−t0)/(t1−t0). Leading/trailing holes (no anchor on
    one side) fall back to the available anchor (equivalent to LOCF/NOCB).
    """
    dense = densify(df, key_cols, bucket_col, step_seconds, value_cols)
    wb = (
        Window.partitionBy(*key_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    if method == "locf":
        for c in value_cols:
            dense = dense.withColumn(c, F.last(c, ignorenulls=True).over(wb))
        return dense
    if method != "linear":
        raise ValueError(f"unknown gap-fill method: {method}")

    # The next-anchor lookup runs over a DESC-ordered cumulative frame, not
    # an (0, unboundedFollowing) frame: Spark's WindowExec materializes the
    # unbounded-FOLLOWING frame per row (O(n²) per partition — measured 138 s
    # on a 43k-row grid), while unbounded-PRECEDING frames keep O(n) running
    # state. last(ignorenulls) over the reversed order is the same value.
    wfr = (
        Window.partitionBy(*key_cols)
        .orderBy(F.desc(bucket_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t = F.unix_timestamp(F.col(bucket_col)).cast("double")
    out = dense
    for c in value_cols:
        anchor_t = F.when(~F.col("is_gap"), t)
        prev_v = F.last(F.when(~F.col("is_gap"), F.col(c)), ignorenulls=True).over(wb)
        prev_t = F.last(anchor_t, ignorenulls=True).over(wb)
        next_v = F.last(F.when(~F.col("is_gap"), F.col(c)), ignorenulls=True).over(wfr)
        next_t = F.last(anchor_t, ignorenulls=True).over(wfr)
        interp = prev_v + (next_v - prev_v) * (t - prev_t) / (next_t - prev_t)
        out = out.withColumn(
            c,
            F.when(~F.col("is_gap"), F.col(c))
            .when(prev_v.isNull(), next_v)
            .when(next_v.isNull(), prev_v)
            .otherwise(interp),
        )
    return out
