"""Sequence History Analysis (SHA) data preparation — person-period rows
carrying each person's past trajectory (reference:
with_event_history_analysis/sequence_history_analysis.py
get_sequence_history_data :116, person_level_to_person_period :12;
studied, not copied). The downstream SHA steps (typology + discrete-time
event-history model fitting) are out of scope.

The reference emits a WIDE matrix: one row per (person, period t) with
history columns holding the states at positions before t (left-aligned:
column p = state_p iff p < t, or ≤ t with ``include_present``;
right-aligned: the same states right-justified into Tm{k} columns with
k = steps back from the period). This engine emits the LONG recast — one
row per (person, period, visible history position) carrying BOTH
indexings:

  seq_id, t (period, 1-based), event (true only at the person's final
  period when their event indicator is set), hist_pos (original position
  p), tm (position counted back from the period: t−p+1 with
  ``include_present`` else t−p — the right-aligned Tm index), state.

Pivot on hist_pos for the reference's left-aligned matrix or on tm for
the right-aligned one (functions/reshape.long_to_wide). Covariates are a
plain per-sequence join the caller can do on seq_id.

Scale note: SHA is inherently quadratic in observation duration (the
reference materializes a (Σ time_i) × T matrix); rows here are
Σ O(time_i²). Cap ``time`` for long transcripts."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def sequence_history_data(
    df: DataFrame,
    durations: DataFrame | None = None,
    include_present: bool = False,
    seq_col: str = "seq_id",
    order_col: str = "pos",
    state_col: str = "state",
) -> DataFrame:
    """Long-format SHA person-period history (see module docstring).

    ``durations``: (seq_id, time, event) — observation duration (number of
    periods, positions are re-ranked 1..len) and event indicator per
    sequence; defaults to the full sequence length with event = true.
    Raises at action time if any duration exceeds its sequence's length
    (the reference's max-time check, folded into the plan so building the
    query costs no Spark job)."""
    from pyspark.sql import Window

    w = Window.partitionBy(seq_col).orderBy(order_col)
    turns = df.select(
        F.col(seq_col).alias("seq_id"),
        F.row_number().over(w).alias("p"),
        F.col(state_col).alias("state"),
    )
    lens = turns.groupBy("seq_id").agg(F.max("p").alias("_len"))
    if durations is None:
        durations = lens.select(
            "seq_id", F.col("_len").alias("time"), F.lit(True).alias("event")
        )
    dur = durations.select(
        "seq_id", F.col("time").cast("int").alias("time"),
        F.col("event").cast("boolean").alias("event"),
    ).join(lens, "seq_id")
    # The reference's max-time-vs-longest-sequence check, folded into the
    # plan (guide §5: no eager driver actions in query construction — the
    # previous limit(1).collect() probe cost one full extra Spark job per
    # call). raise_error fires at ACTION time on the first offending row.
    checked_time = F.when(
        F.col("time") <= F.col("_len"), F.col("time")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("duration exceeds sequence length for seq_id="),
                F.col("seq_id").cast("string"),
                F.lit(
                    " (the reference's max-time-vs-longest-sequence check)"
                ),
            )
        ).cast("int")
    )
    periods = dur.select(
        "seq_id",
        F.explode(F.sequence(F.lit(1), checked_time)).alias("t"),
        "event",
        F.col("time"),
    ).select(
        "seq_id",
        "t",
        # event flag true only at the person's FINAL period
        (F.col("event") & (F.col("t") == F.col("time"))).alias("event"),
    )
    joined = periods.join(turns, "seq_id")
    vis = (
        F.col("p") <= F.col("t")
        if include_present
        else F.col("p") < F.col("t")
    )
    tm = (
        F.col("t") - F.col("p") + (1 if include_present else 0)
    )
    return joined.filter(vis).select(
        "seq_id",
        "t",
        "event",
        F.col("p").alias("hist_pos"),
        tm.alias("tm"),
        "state",
    )
