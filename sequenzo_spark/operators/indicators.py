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


def mean_time_in_states(
    df: DataFrame,
    seq_col: str = "seq_id",
    state_col: str = "state",
    weight_col: str | None = None,
    serr: bool = False,
) -> DataFrame:
    """seqmeant: weighted mean time per state across all sequences, with
    optional Var/Stdev/SE under the finite-population correction
    (cross_sectional_indicators.py:25-102; serr block :90-100).

    Sequences that never visit a state count as 0 time in it, so the moment
    algebra expands around the zero contributions instead of materializing
    them: Σw(c−m)² = Σw·c² − 2m·Σw·c + m²·wtot. Two hash aggregations, no
    per-seq pivot, no zero-row explosion — the 100 TB shape.
    """
    valid = df.filter(F.col(state_col).isNotNull())
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    # per-(seq,state) time c and the sequence weight (weights are per-seq)
    per = valid.groupBy(seq_col, state_col).agg(
        F.count(F.lit(1)).cast("double").alias("_c"),
        F.first(w).alias("_w"),
    )
    # scalar weight totals over ALL sequences (incl. zero-time ones)
    seqw = valid.groupBy(seq_col).agg(F.first(w).alias("_w"))
    tot = seqw.agg(
        F.sum("_w").alias("_wtot"), F.sum(F.col("_w") * F.col("_w")).alias("_w2tot")
    )
    g = per.groupBy(F.col(state_col).alias("state")).agg(
        F.sum(F.col("_w") * F.col("_c")).alias("_swc"),
        F.sum(F.col("_w") * F.col("_c") * F.col("_c")).alias("_swc2"),
    )
    g = g.crossJoin(F.broadcast(tot))
    mean = F.col("_swc") / F.col("_wtot")
    out = g.select("state", mean.alias("mean_time"), "_swc", "_swc2", "_wtot", "_w2tot")
    if serr:
        m = F.col("mean_time")
        ssq = F.col("_swc2") - 2 * m * F.col("_swc") + m * m * F.col("_wtot")
        var = ssq * F.col("_wtot") / (F.col("_wtot") * F.col("_wtot") - F.col("_w2tot"))
        out = (
            out.withColumn("var_time", var)
            .withColumn("sd_time", F.sqrt(var))
            .withColumn("se_time", F.sqrt(var / F.col("_wtot")))
        )
    return out.drop("_swc", "_swc2", "_wtot", "_w2tot")


def entropy_difference(
    df: DataFrame,
    norm: bool = True,
    seq_col: str = "seq_id",
    order_col: str = "pos",
    state_col: str = "state",
) -> DataFrame:
    """seqientdiff: Shannon entropy of each sequence's spell-duration vector
    (entropy_difference.py:25-103). ``norm`` divides by the all-1-spell
    maximum entmax = −L·(1/L)·ln(1/L) = ln(L), applied only when ent > 0
    (:80-86). Output: seq_id, hdss."""
    spells = spell_table(df, seq_col, order_col, state_col)
    wlen = Window.partitionBy(seq_col)
    p = F.col("duration") / F.sum("duration").over(wlen)
    per = (
        spells.withColumn("_p", p)
        .groupBy(F.col(seq_col).alias("seq_id"))
        .agg(
            (-F.sum(F.col("_p") * F.log("_p"))).alias("_ent"),
            F.sum("duration").alias("_len"),
        )
    )
    if norm:
        hdss = F.when(
            F.col("_ent") > 0, F.col("_ent") / F.log(F.col("_len").cast("double"))
        ).otherwise(F.lit(0.0))
    else:
        hdss = F.col("_ent")
    return per.select("seq_id", hdss.alias("hdss"))


def spell_duration_variance(
    df: DataFrame,
    n_states: int,
    var_type: int = 1,
    seq_col: str = "seq_id",
    order_col: str = "pos",
    state_col: str = "state",
) -> DataFrame:
    """seqivardur: per-sequence population variance of spell durations
    (variance_of_spell_durations.py).

    type 1 (:45-48): variance over observed spells; var_max =
    (dlgth−1)(1−meand)².
    type 2 (:50-72): non-visited alphabet states count as 0-duration spells —
    meand = L/(dlgth+nnvisit); var = (Σ(d−m)² + nnvisit·m²)/(dlgth+nnvisit);
    var_max via maxnnv = K−1 if dlgth==1 else K−2 (0 when K<2) and
    meand_max = m·(dlgth+nnvisit)/(dlgth+maxnnv).

    All moments derive from exact integer sums (Σd, Σd², counts) with a fixed
    expression order so a SQL oracle lands on the bit-identical double.
    Output: seq_id, n_spells, meand, var_spell_dur, var_max.
    """
    if var_type not in (1, 2):
        raise ValueError("var_type must be 1 or 2")
    spells = spell_table(df, seq_col, order_col, state_col)
    g = spells.groupBy(F.col(seq_col).alias("seq_id")).agg(
        F.count(F.lit(1)).alias("n_spells"),
        F.sum("duration").alias("_len"),
        F.sum(F.col("duration") * F.col("duration")).alias("_sq"),
        F.countDistinct("state").alias("_visited"),
    )
    dlgth = F.col("n_spells").cast("double")
    lgth = F.col("_len").cast("double")
    sq = F.col("_sq").cast("double")
    if var_type == 1:
        meand = lgth / dlgth
        var = sq / dlgth - meand * meand
        var_max = (dlgth - 1) * (F.lit(1.0) - meand) * (F.lit(1.0) - meand)
    else:
        k = float(n_states)
        nnv = F.lit(k) - F.col("_visited").cast("double")
        denom = dlgth + nnv
        meand = lgth / denom
        ssq = sq - 2 * meand * lgth + dlgth * meand * meand
        var = (ssq + nnv * meand * meand) / denom
        if n_states < 2:
            maxnnv = F.lit(0.0)
        else:
            maxnnv = F.when(F.col("n_spells") == 1, F.lit(k - 1)).otherwise(
                F.lit(k - 2)
            )
        meand_max = meand * denom / (dlgth + maxnnv)
        var_max = (
            (dlgth - 1) * (F.lit(1.0) - meand_max) * (F.lit(1.0) - meand_max)
            + (lgth - dlgth + 1 - meand_max) * (lgth - dlgth + 1 - meand_max)
            + maxnnv * meand_max * meand_max
        ) / (dlgth + maxnnv)
    return g.select(
        "seq_id",
        "n_spells",
        meand.alias("meand"),
        var.alias("var_spell_dur"),
        var_max.alias("var_max"),
    )


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


def stat_summary(df: DataFrame, value_col: str) -> DataFrame:
    """count/mean/median/min/q1/q3/max of a per-sequence stat column —
    get_sequence_length_summary / get_transition_count_summary semantics
    (statistics/sequence_statistics.py:85-124; numpy linear-interpolation
    quantiles → Spark's EXACT ``percentile``, not percentile_approx).

    Scale note: this is one global aggregate over ONE ROW PER SEQUENCE (not
    per turn); exact percentile over 10⁹ sequence rows is a single sort-based
    agg — acceptable for a summary; swap percentile_approx in if even that
    is too hot."""
    v = F.col(value_col).cast("double")
    return df.agg(
        F.count(v).alias("count"),
        F.avg(v).alias("mean"),
        F.percentile(v, F.lit(0.5)).alias("median"),
        F.min(v).alias("min"),
        F.percentile(v, F.lit(0.25)).alias("q1"),
        F.percentile(v, F.lit(0.75)).alias("q3"),
        F.max(v).alias("max"),
    )


def _phi_dp(seq: list) -> float:
    """Driver-side copy of the subsequence-count DP (same recurrence as
    _phi_subsequences) for the single synthetic max sequence used by
    turbulence norm — O(len), one sequence, no reason to ship to a worker."""
    last: dict = {}
    phi = 1.0
    for s in seq:
        prev = phi
        phi = 2.0 * phi - last.get(s, 0.0)
        if phi > 1e15:
            phi = 1e15
        last[s] = prev
    return phi


def turbulence(
    df: DataFrame,
    seq_col: str = "seq_id",
    order_col: str = "pos",
    state_col: str = "state",
    var_type: int = 1,
    norm: bool = False,
    states: list | None = None,
    max_length: int | None = None,
) -> DataFrame:
    """Per-sequence turbulence T = log2(φ · (s²max+1)/(s²+1)),
    s² / s²max from seqivardur ``var_type`` 1 or 2 (turbulence.py:22-28, :73-76;
    variance_of_spell_durations.py:45-72).

    Spell stats are plain aggregates; only φ needs the pandas-UDF DP, fed by
    an ordered ``collect_list`` of spell states (sorted by spell_id inside the
    array for determinism, never relying on shuffle order).

    ``norm=True`` (turbulence.py:94-145): normalize by the turbulence maxT of
    the synthetic max-turbulence sequence — the alphabet cycled to the
    longest observed length. maxT is ONE scalar: its φ is the same DP run
    driver-side and its spell variance is closed-form (all spells length 1),
    so normalization costs one tiny aggregate, not a second engine pass.
    T_norm = (T−1)/(maxT−1), clamped to 0 where T < 1 (:141-143).
    ``norm`` requires ``states`` (the declared alphabet).

    ``max_length``: the longest sequence length, needed only for ``norm``.
    When None it is probed with a scalar aggregate over the spell pipeline —
    which at 100 TB evaluates that pipeline twice (once for the probe, once
    for the result). Pass it explicitly when known (e.g. a bounded
    conversation length or a stored tier statistic) to keep norm single-pass.
    """
    from sequenzo_spark import ensure_workers_can_import

    if var_type not in (1, 2):
        raise ValueError("var_type must be 1 or 2")
    if norm and not states:
        raise ValueError("norm=True requires the declared alphabet `states`")
    ensure_workers_can_import(df.sparkSession)
    spells = spell_table(df, seq_col, order_col, state_col)
    per = spells.groupBy(F.col(seq_col).alias("seq_id")).agg(
        F.array_sort(
            F.collect_list(F.struct("spell_id", "state"))
        ).alias("_sp"),
        F.count(F.lit(1)).alias("n_spells"),
        F.sum("duration").alias("_len"),
        F.sum(F.col("duration") * F.col("duration")).alias("_sq"),
        F.countDistinct("state").alias("_visited"),
    )
    dlgth = F.col("n_spells").cast("double")
    lgth = F.col("_len").cast("double")
    sq = F.col("_sq").cast("double")
    if var_type == 1:
        meand = lgth / dlgth
        s2 = sq / dlgth - meand * meand
        s2max = (dlgth - 1) * (F.lit(1.0) - meand) * (F.lit(1.0) - meand)
    else:
        k = float(len(states)) if states else None
        if k is None:
            raise ValueError("var_type=2 requires the declared alphabet `states`")
        nnv = F.lit(k) - F.col("_visited").cast("double")
        denom = dlgth + nnv
        meand = lgth / denom
        ssq = sq - 2 * meand * lgth + dlgth * meand * meand
        s2 = (ssq + nnv * meand * meand) / denom
        maxnnv = (
            F.lit(0.0)
            if k < 2
            else F.when(F.col("n_spells") == 1, F.lit(k - 1)).otherwise(F.lit(k - 2))
        )
        meand_max = meand * denom / (dlgth + maxnnv)
        s2max = (
            (dlgth - 1) * (F.lit(1.0) - meand_max) * (F.lit(1.0) - meand_max)
            + (lgth - dlgth + 1 - meand_max) * (lgth - dlgth + 1 - meand_max)
            + maxnnv * meand_max * meand_max
        ) / (dlgth + maxnnv)
    dss_states = F.transform(F.col("_sp"), lambda s: s["state"])
    out = per.withColumn("phi", _phi_subsequences(dss_states)).withColumn(
        "turbulence",
        F.log2(F.col("phi") * (s2max + 1.0) / (s2 + 1.0)),
    )
    if norm:
        # `max_length` is trusted as the TRUE max sequence length: the
        # normalizing max-turbulence is computed from a synthetic sequence of
        # exactly that length, so a smaller value silently yields norm-T > 1
        # (the reference likewise trusts its seqdata dimensions,
        # turbulence.py:40-47). Validate what we can cheaply: an explicit 0 or
        # negative is a caller bug, not "unset" (`is None` is the unset test —
        # `or` would swallow 0).
        if max_length is not None and int(max_length) < 1:
            raise ValueError(
                f"max_length must be >= 1 (and >= the actual max sequence "
                f"length); got {max_length}"
            )
        if max_length is not None:
            maxlength = int(max_length)
        else:
            # probe the max sequence length from the BASE rows (column-
            # pruned scan + count per seq), not from the spell pipeline:
            # the old out.agg(max(_len)) probe re-ran the whole window +
            # spell aggregation a second time. Equal by construction:
            # _len = Σ spell durations = # non-null-state turns.
            maxlength = (
                df.filter(F.col(state_col).isNotNull())
                .groupBy(F.col(seq_col))
                .agg(F.count(F.lit(1)).alias("_c"))
                .agg(F.max("_c"))
                .first()[0]
                or 1
            )
        k = len(states)
        nrep = -(-int(maxlength) // k)
        synth = (list(states) * nrep)[: int(maxlength)]
        # Spell stats of the synthetic sequence from its ACTUAL run-lengths —
        # for k>1 every spell has duration 1, but for k==1 the whole sequence
        # is ONE long spell, so the duration-1 closed form would be wrong
        # (round-2 advisor finding). φ likewise runs on the DSS (as the
        # engine does for real sequences), not the raw synthetic string.
        from itertools import groupby

        runs = [(s, sum(1 for _ in run)) for s, run in groupby(synth)]
        durs = [d for _s, d in runs]
        phi_max = _phi_dp([s for s, _d in runs])
        n = float(len(durs))  # DSS length of the synthetic sequence
        length = float(len(synth))
        visited = float(len(set(synth)))
        mean_d = length / n
        if var_type == 1:
            s2_s = sum((d - mean_d) ** 2 for d in durs) / n
            s2max_s = (n - 1) * (1 - mean_d) ** 2
        else:
            nnv_s = k - visited
            meand_s = length / (n + nnv_s)
            s2_s = (
                sum((d - meand_s) ** 2 for d in durs) + nnv_s * meand_s**2
            ) / (n + nnv_s)
            maxnnv_s = 0.0 if k < 2 else (k - 1.0 if n == 1 else k - 2.0)
            meand_max_s = meand_s * (n + nnv_s) / (n + maxnnv_s)
            s2max_s = (
                (n - 1) * (1 - meand_max_s) ** 2
                + (length - n + 1 - meand_max_s) ** 2
                + maxnnv_s * meand_max_s**2
            ) / (n + maxnnv_s)
        max_t = math.log2(phi_max * (s2max_s + 1.0) / (s2_s + 1.0))
        if max_t <= 1.0:
            # Degenerate alphabets/lengths (k==1, or maxlength==1 → maxT==1)
            # make (T−1)/(maxT−1) divide by zero; the reference's norm path
            # assumes a non-degenerate alphabet. Return UNNORMALIZED values
            # rather than nulls (advisor-prescribed behavior).
            return out.select("seq_id", "n_spells", "phi", "turbulence")
        out = out.withColumn(
            "turbulence",
            F.when(F.col("turbulence") < 1, F.lit(0.0)).otherwise(
                (F.col("turbulence") - 1.0) / F.lit(max_t - 1.0)
            ),
        )
    return out.select("seq_id", "n_spells", "phi", "turbulence")


def state_freq_per_seq(
    df: DataFrame,
    states: list,
    seq_col: str = "seq_id",
    state_col: str = "state",
    prop: bool = False,
    weight_col: str | None = None,
) -> DataFrame:
    """seqistatd (state_frequencies_and_entropy_per_sequence.py:15-38): one
    row per sequence, one column per declared state with the (weighted) time
    spent in it; ``prop=True`` divides by the row total.

    The explicit ``states`` list makes the pivot single-pass (no
    distinct-scan job) and fixes the output schema up front — the
    reference's declared-alphabet regime. Absent states are 0, matching the
    dense matrix semantics."""
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    p = (
        df.filter(F.col(state_col).isNotNull())
        .groupBy(F.col(seq_col).alias("seq_id"))
        .pivot(state_col, values=[str(s) for s in states])
        .agg(F.sum(w))
    )
    for s in states:
        p = p.withColumn(str(s), F.coalesce(F.col(f"`{s}`"), F.lit(0.0)))
    if prop:
        # single select against the ORIGINAL columns: sequential withColumn
        # would re-evaluate the row total against already-normalized values
        total = None
        for s in states:
            total = F.col(f"`{s}`") if total is None else total + F.col(f"`{s}`")
        p = p.select(
            "seq_id",
            *[
                F.when(total == 0, F.lit(0.0))
                .otherwise(F.col(f"`{s}`") / total)
                .alias(str(s))
                for s in states
            ],
        )
    return p


def positive_negative_indicator(
    df: DataFrame,
    pos_states: list[str] | None = None,
    neg_states: list[str] | None = None,
    index: str = "share",
    dss: bool | None = None,
    power: float = 1.0,
    volatility_w: float = 0.5,
    seq_col: str = "seq_id",
    order_col: str = "pos",
    state_col: str = "state",
) -> DataFrame:
    """Binary positive/negative indicators — TraMineR seqipos
    (sequence_characteristics_indicators/binary_indicators.py:131, studied
    not copied): states recode to 'p'/'n' (one side may be implied as the
    alphabet complement; states in neither side become missing and drop
    out — identical to the reference whenever pos ∪ neg covers the
    alphabet), then

      index="share":      n_p / (n_p + n_n), by default over the DSS
                          (spells of the ORIGINAL states, recoded);
      index="integr":     integration index of 'p' over the binary
                          sequence (position-power weighted share);
      index="volatility": volatility of the binary sequence (K = 2).

    ``dss`` defaults to True only for "share" (the reference's default).
    Output: seq_id, value (column named after ``index``)."""
    if pos_states is None and neg_states is None:
        raise ValueError("give pos_states and/or neg_states")
    if index not in ("share", "integr", "volatility"):
        raise ValueError("index must be share, integr or volatility")
    if dss is None:
        dss = index == "share"
    if pos_states is None or neg_states is None:
        alpha = sorted(
            r[0] for r in df.select(state_col).distinct().collect()
        )
        if pos_states is None:
            pos_states = [s for s in alpha if s not in set(neg_states)]
        else:
            neg_states = [s for s in alpha if s not in set(pos_states)]
    overlap = set(pos_states) & set(neg_states)
    if overlap:
        raise ValueError(f"states in both sides: {sorted(overlap)}")

    if dss:
        src = spell_table(df, seq_col, order_col, state_col).select(
            F.col("seq_id"),
            F.col("spell_id").alias("_p"),
            F.col("state").alias("_s"),
        )
    else:
        src = df.select(
            F.col(seq_col).alias("seq_id"),
            F.col(order_col).alias("_p"),
            F.col(state_col).alias("_s"),
        )
    binary = (
        F.when(F.col("_s").isin(list(pos_states)), F.lit("p"))
        .when(F.col("_s").isin(list(neg_states)), F.lit("n"))
        .otherwise(F.lit(None).cast("string"))
    )
    rows = src.select("seq_id", "_p", binary.alias("_b")).filter(
        F.col("_b").isNotNull()
    )
    if index == "share":
        return rows.groupBy("seq_id").agg(
            (
                F.sum(F.when(F.col("_b") == "p", 1.0).otherwise(0.0))
                / F.count(F.lit(1))
            ).alias("share")
        )
    if index == "integr":
        return integration_index(
            rows, "p", power=power, seq_col="seq_id", order_col="_p",
            state_col="_b",
        ).select("seq_id", F.col("integration").alias("integr"))
    return sequence_indicators(
        rows, n_states=2, volatility_w=volatility_w, seq_col="seq_id",
        order_col="_p", state_col="_b",
    ).select("seq_id", "volatility")
