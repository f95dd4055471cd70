"""Wide↔long reshape + person-period expansion.

Reference semantics (studied, not copied):
- wide_to_long_format_data (/root/reference/sequenzo/data_preprocessing/
  helpers.py:135-157): melt wide time columns into (id, time, state) rows.
- long_to_wide_format_data (helpers.py:77-132): pivot long rows into one
  column per time point, outer-merged per value column.
- person_level_to_person_period (with_event_history_analysis/
  sequence_history_analysis.py:12-62): expand one row per person into one
  row per observed period 1..time, event flag true only at the final period.

Spark recast: melt is a stack/unpivot expression (no shuffle — row-local);
pivot is the built-in groupBy().pivot() with an explicit time-value list so
the plan needs no discovery pass; person-period is explode(sequence(1,t)) —
row-local generation, output partitioning inherited, no collect anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def wide_to_long(
    df: DataFrame,
    id_col: str,
    time_cols: list[str],
    var_name: str = "time",
    value_name: str = "state",
) -> DataFrame:
    """Melt wide time columns into long (id, time, state) rows.

    Pure row-local expression (one output row per (row, time col)); Catalyst
    prunes unreferenced wide columns from the scan."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias(var_name), F.col(c).cast("string").alias(value_name)
            )
            for c in time_cols
        ]
    )
    return df.select(id_col, F.explode(pairs).alias("_kv")).select(
        id_col, f"_kv.{var_name}", f"_kv.{value_name}"
    )


def long_to_wide(
    df: DataFrame,
    id_col: str,
    time_col: str,
    value_col: str,
    time_values: list | None = None,
) -> DataFrame:
    """Pivot long rows to one column per time point (``<value_col>_<t>``).

    ``time_values`` makes the pivot single-pass (no distinct-scan job) — at
    scale the time axis is always known up front (reference requires an
    explicit time list too, define_sequence_data.py:94)."""
    p = df.groupBy(id_col).pivot(
        time_col, values=[str(v) for v in time_values] if time_values else None
    )
    wide = p.agg(F.first(value_col))
    renames = {c: f"{value_col}_{c}" for c in wide.columns if c != id_col}
    return wide.withColumnsRenamed(renames)


def person_period(
    df: DataFrame,
    id_col: str = "id",
    period_col: str = "time",
    event_col: str = "event",
) -> DataFrame:
    """Person-level (id, time, event) → person-period rows: one row per
    period 1..time, event flag only at the final period
    (sequence_history_analysis.py:12-62).

    explode(sequence(1, time)) is row-local — no shuffle, output size
    Σ time_i. Validation mirrors the reference: NULLs and non-positive
    durations rejected (cheap aggregate, fail-fast)."""
    bad = df.filter(
        F.col(id_col).isNull()
        | F.col(period_col).isNull()
        | F.col(event_col).isNull()
        | (F.col(period_col) < 1)
    ).limit(1)
    if bad.count() > 0:
        raise ValueError(
            "person_period: id/time/event must be non-null and time >= 1"
        )
    per = F.explode(
        F.sequence(F.lit(1), F.col(period_col).cast("int"))
    ).alias("period")
    return df.select(F.col(id_col).alias("id"), F.col(period_col), F.col(event_col)).select(
        "id",
        per,
        F.col(period_col).alias("_t"),
        F.col(event_col).alias("_e"),
    ).select(
        "id",
        F.col("period").alias("time"),
        (
            (F.col("period") == F.col("_t")) & F.col("_e").cast("boolean")
        ).alias("event"),
    )
