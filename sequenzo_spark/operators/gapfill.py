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
    max_ungrouped_buckets: int = 50_000_000,
) -> DataFrame:
    """Expand each key's series onto the dense bucket grid between its min and
    max bucket; absent buckets appear with NULL values and is_gap=true.

    With ``key_cols=[]`` the grid (and the downstream fill windows) is one
    un-partitioned series; a cheap min/max probe refuses grids above
    ``max_ungrouped_buckets`` instead of silently planning one giant task
    (see the scale contract in :func:`fill_gaps`)."""
    value_cols = value_cols or [
        c for c in df.columns if c not in key_cols + [bucket_col]
    ]
    if not key_cols:
        lo, hi = df.agg(F.min(bucket_col), F.max(bucket_col)).first()
        if lo is not None:
            n_buckets = int((hi - lo).total_seconds() // step_seconds) + 1
            if n_buckets > max_ungrouped_buckets:
                raise ValueError(
                    f"ungrouped densify would build a {n_buckets:,}-bucket "
                    f"single-series grid (> {max_ungrouped_buckets:,}); pass "
                    "key_cols for a per-series fill, chunk the time range, "
                    "or raise max_ungrouped_buckets explicitly"
                )
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

    Scale contract for ``key_cols=[]``: the fill windows are then
    UN-PARTITIONED, so the whole grid lands in one task. This is safe by the
    same cardinality argument as js_divergence_consecutive
    (distributions.py:118-122): the grid size is bounded by the TIME RANGE /
    step — e.g. a decade of minutes is ~5.3M rows — never by raw data
    volume, because the input here is already one row per bucket. A
    finer-than-minute global grid over decades should instead pass key_cols
    (per-series fill) or chunk the range; as a guardrail, densify refuses a
    single-series grid above ``max_ungrouped_buckets`` (default 50M) rather
    than silently planning a week-long single task.
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
