"""Spell derivation — the gaps-and-islands recast of seqdss / seqdur.

Reference semantics (studied, not copied):
- seqdss (/root/reference/sequenzo/dissimilarity_measures/utils/seqdss.pyx:8-34):
  forward-fill missing, collapse consecutive equal states → distinct-state
  sequence.
- seqdur (seqdur.pyx:8-36): run lengths of those collapsed spells.
- convert_seqdata_to_spells (prefix_tree/spell_level_indicators.py:41-92):
  one row per (seq, spell) with state + duration.

Spark recast: a single partition-local window pass per sequence —
``lag`` detects run boundaries, a cumulative ``sum`` numbers the islands,
then one groupBy produces the spell table. No UDFs; everything stays in
whole-stage codegen. At 10^12 turns the only shuffle is the hash partition
by seq_id (and Spark reuses it for the groupBy because spell keys are
prefixed by seq_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def locf_fill(
    df: DataFrame,
    cols: list[str],
    seq_col: str = "seq_id",
    order_col: str = "pos",
) -> DataFrame:
    """Forward-fill NULLs in ``cols`` within each sequence (LOCF).

    Mirrors the reference's own gap-fill precedent: the ffill loop in
    seqdss.pyx:19-21 / seqdur.pyx:19-20. Implemented with
    ``last(ignorenulls=True)`` over an unbounded-preceding frame.
    """
    w = (
        Window.partitionBy(seq_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out


def _with_spell_id(
    df: DataFrame, seq_col: str, order_col: str, state_col: str
) -> DataFrame:
    w = Window.partitionBy(seq_col).orderBy(order_col)
    is_new = (
        F.lag(state_col).over(w).isNull()
        | (F.lag(state_col).over(w) != F.col(state_col))
    ).cast("int")
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn("spell_id", F.sum(is_new).over(wc))


def spell_table(
    df: DataFrame,
    seq_col: str = "seq_id",
    order_col: str = "pos",
    state_col: str = "state",
    weight_col: str | None = None,
    ts_col: str | None = None,
    forward_fill_missing: bool = True,
) -> DataFrame:
    """One row per (sequence, spell): state, duration (turn count), bounds.

    ``forward_fill_missing`` applies LOCF before run detection, matching
    seqdur.pyx:19-20 (missing never breaks nor forms a spell). Output
    columns: seq_id, spell_id (1-based), state, duration, pos_start, pos_end
    [, ts_start, ts_end, weight].
    """
    if forward_fill_missing:
        df = locf_fill(df, [state_col], seq_col, order_col)
    df = df.filter(F.col(state_col).isNotNull())
    df = _with_spell_id(df, seq_col, order_col, state_col)

    aggs = [
        F.first(state_col).alias("state"),
        F.count(F.lit(1)).alias("duration"),
        F.min(order_col).alias("pos_start"),
        F.max(order_col).alias("pos_end"),
    ]
    if ts_col:
        aggs += [F.min(ts_col).alias("ts_start"), F.max(ts_col).alias("ts_end")]
    if weight_col:
        aggs.append(F.first(weight_col).alias("weight"))
    return (
        df.groupBy(F.col(seq_col).alias("seq_id"), "spell_id")
        .agg(*aggs)
        .withColumnRenamed("seq_id", seq_col)
    )


def dss(
    df: DataFrame,
    seq_col: str = "seq_id",
    order_col: str = "pos",
    state_col: str = "state",
) -> DataFrame:
    """Distinct-state sequence rows (seqdss semantics): the first turn of
    every spell, with ``spell_id`` as the new ordinal."""
    filled = locf_fill(df, [state_col], seq_col, order_col)
    w = Window.partitionBy(seq_col).orderBy(order_col)
    prev = F.lag(state_col).over(w)
    boundary = filled.filter(F.col(state_col).isNotNull()).withColumn(
        "_is_new", (prev.isNull() | (prev != F.col(state_col))).cast("int")
    )
    wc = Window.partitionBy(seq_col).orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        boundary.withColumn("spell_id", F.sum("_is_new").over(wc))
        .filter(F.col("_is_new") == 1)
        .drop("_is_new")
    )
