"""Per-sequence indicators — the seqlength/seqtransn/seqient/seqivardur/
seqici/seqivolatility/seqintegr/seqST family as one shared aggregation pass.

Reference semantics (studied, not copied; all paths under /root/reference/
sequenzo/sequence_characteristics/):
- sequence length: count of valid positions (basic_indicators.py:34-72).
- transitions: DSS length − 1, 0 if empty (simple_characteristics.py:296-300);
  norm variant /(len−1), 0 if len≤1 (:302-306).
- visited states: distinct states (basic_indicators.py:122-178);
  recurrence = DSS length / visited (:181-234).
- within-sequence entropy: Shannon entropy of the per-seq state distribution,
  norm /ln K (within_sequence_entropy.py:20-43).
- spell-duration mean/variance: population variance over the spell table
  (variance_of_spell_durations.py:45-48, basic_indicators.py:237-346).
- complexity index: sqrt(norm_transitions × norm_entropy)
  (complexity_index.py:19-38).
- volatility: w·(visited−1)/(K−1) + (1−w)·norm_transitions
  (volatility.py:86-90).
- integration index: Σ pos^p·1[s=k] / Σ pos^p (integration_index.py:88).
- turbulence: log2(φ · (s²max+1)/(s²+1)), φ = #distinct subsequences of the
  DSS via DP, clipped at 1e15; s²max = (n−1)(1−t̄)² (turbulence.py:22-154,
  simple_characteristics.py:18-80).

Everything except the subsequence-count DP is a pure DataFrame expression
(two hash aggregations sharing one shuffle by seq_id). The DP is inherently
sequential per sequence → a vectorized pandas UDF over per-seq spell arrays
(Arrow transfer, no per-row Python at the Spark level).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from sequenzo_spark.operators.spells import spell_table


def sequence_indicators(
    df: DataFrame,
    n_states: int,
    seq_col: str = "seq_id",
    order_col: str = "pos",
    state_col: str = "state",
    volatility_w: float = 0.5,
) -> DataFrame:
    """One row per sequence with the full indicator battery.

    ``n_states`` is the declared alphabet size K (reference requires an
    explicit alphabet, define_sequence_data.py:148).
    """
    w = Window.partitionBy(seq_col).orderBy(order_col)
    valid = df.filter(F.col(state_col).isNotNull())
    changed = (F.lag(state_col).over(w) != F.col(state_col)).cast("int")
    turns = valid.withColumn("_chg", changed)

    per_seq = turns.groupBy(F.col(seq_col).alias("seq_id")).agg(
        F.count(F.lit(1)).alias("length"),
        F.countDistinct(state_col).alias("visited"),
        F.coalesce(F.sum("_chg"), F.lit(0)).alias("transitions"),
    )

    # within-sequence entropy from per-(seq,state) counts.
    wlen = Window.partitionBy(seq_col)
    ent = (
        valid.groupBy(F.col(seq_col), F.col(state_col))
        .agg(F.count(F.lit(1)).alias("_c"))
        .withColumn("_p", F.col("_c") / F.sum("_c").over(wlen))
        .groupBy(F.col(seq_col).alias("seq_id"))
        .agg((-F.sum(F.col("_p") * F.log("_p"))).alias("entropy"))
    )

    spells = spell_table(df, seq_col, order_col, state_col)
    sp = spells.groupBy(F.col(seq_col).alias("seq_id")).agg(
        F.count(F.lit(1)).alias("n_spells"),
        F.avg("duration").alias("mean_spell_duration"),
        F.coalesce(F.var_pop("duration"), F.lit(0.0)).alias("spell_duration_var"),
        F.coalesce(F.stddev_pop("duration"), F.lit(0.0)).alias("spell_duration_sd"),
    )

    out = per_seq.join(ent, "seq_id", "left").join(sp, "seq_id", "left")
    lnk = math.log(n_states) if n_states > 1 else 1.0
    denom = F.when(F.col("length") > 1, F.col("length") - 1).otherwise(F.lit(1))
    out = (
        out.withColumn("entropy_norm", F.col("entropy") / F.lit(lnk))
        .withColumn(
            "transitions_norm",
            F.when(F.col("length") <= 1, F.lit(0.0)).otherwise(
                F.col("transitions") / denom
            ),
        )
        .withColumn(
            "recurrence",
            F.col("n_spells") / F.col("visited"),
        )
        .withColumn(
            "complexity",
            F.sqrt(F.col("transitions_norm") * F.col("entropy_norm")),
        )
        .withColumn(
            "volatility",
            F.lit(volatility_w)
            * (F.col("visited") - 1)
            / F.lit(max(n_states - 1, 1))
            + F.lit(1.0 - volatility_w) * F.col("transitions_norm"),
        )
    )
    return out


def integration_index(
    df: DataFrame,
    target_state: str,
    power: float = 1.0,
    seq_col: str = "seq_id",
    order_col: str = "pos",
    state_col: str = "state",
) -> DataFrame:
    """Position-weighted share of ``target_state`` per sequence
    (integration_index.py:88): Σ (pos+1)^p·1[s=k] / Σ (pos+1)^p.

    Positions are re-ranked 1..len over valid turns (the reference weights
    column positions 1..T)."""
    w = Window.partitionBy(seq_col).orderBy(order_col)
    valid = df.filter(F.col(state_col).isNotNull())
    pw = F.pow(F.row_number().over(w).cast("double"), F.lit(float(power)))
    return (
        valid.withColumn("_pw", pw)
        .groupBy(F.col(seq_col).alias("seq_id"))
        .agg(
            (
                F.sum(F.when(F.col(state_col) == target_state, F.col("_pw")).otherwise(0.0))
                / F.sum("_pw")
            ).alias("integration")
        )
    )


@pandas_udf(T.DoubleType())
def _phi_subsequences(states: pd.Series) -> pd.Series:
    """#distinct subsequences of a DSS state array (incl. empty), clipped at
    1e15 — matches the reference's DP + cap (simple_characteristics.py:18-80,
    turbulence.py:66-70). Vectorized over sequences; DSS arrays are short."""
    out = np.empty(len(states), dtype=np.float64)
    cap = 1e15
    for i, seq in enumerate(states):
        if seq is None or len(seq) == 0:
            out[i] = 1.0
            continue
        last: dict[str, float] = {}
        phi = 1.0  # empty subsequence
        for s in seq:
            prev = phi
            phi = 2.0 * phi - last.get(s, 0.0)
            if phi > cap:
                phi = cap
            last[s] = prev
        out[i] = phi
    return pd.Series(out)


def turbulence(
    df: DataFrame,
    seq_col: str = "seq_id",
    order_col: str = "pos",
    state_col: str = "state",
) -> DataFrame:
    """Per-sequence turbulence T = log2(φ · (s²max+1)/(s²+1)),
    s²max = (n−1)(1−t̄)² (turbulence.py:22-28).

    Spell stats are plain aggregates; only φ needs the pandas-UDF DP, fed by
    an ordered ``collect_list`` of spell states (sorted by spell_id inside the
    array for determinism, never relying on shuffle order)."""
    from sequenzo_spark import ensure_workers_can_import

    ensure_workers_can_import(df.sparkSession)
    spells = spell_table(df, seq_col, order_col, state_col)
    per = spells.groupBy(F.col(seq_col).alias("seq_id")).agg(
        F.array_sort(
            F.collect_list(F.struct("spell_id", "state"))
        ).alias("_sp"),
        F.count(F.lit(1)).alias("n_spells"),
        F.avg("duration").alias("_mean_dur"),
        F.coalesce(F.var_pop("duration"), F.lit(0.0)).alias("_var_dur"),
    )
    dss_states = F.transform(F.col("_sp"), lambda s: s["state"])
    s2max = (F.col("n_spells") - 1) * F.pow(F.lit(1.0) - F.col("_mean_dur"), 2)
    return (
        per.withColumn("phi", _phi_subsequences(dss_states))
        .withColumn(
            "turbulence",
            F.log2(F.col("phi") * (s2max + 1.0) / (F.col("_var_dur") + 1.0)),
        )
        .select("seq_id", "n_spells", "phi", "turbulence")
    )
