"""Spell survival analysis — weighted Kaplan–Meier curves over spell
durations (reference: with_event_history_analysis/spell_survival_analysis.py,
studied not copied).

Reference semantics:
- the spell table marks a spell as an EVENT iff it is not the sequence's
  last spell (``status = end != length``, :129 — the final spell is
  censored by the observation window);
- per stratum (state by default; optionally a per-sequence group), the
  weighted KM estimator (_weighted_kaplan_meier, :138) emits one row per
  distinct duration with event-or-censor mass:
    n.risk  = Σ w over spells with dur ≥ t
    n.event = Σ w over event spells with dur == t
    surv    = Π_{event times ≤ t} (1 − d/r)
    std.err = surv · sqrt(Σ_{event times ≤ t} d/(r(r−d)))   (Greenwood)

Spark shape: spell_table → one groupBy(stratum, duration) aggregate, then
three cumulative windows per stratum (reverse-cumulative at-risk mass,
cumulative log-product for the survival curve, cumulative Greenwood sum).
The product is computed as exp(Σ ln(1−d/r)) — the window-friendly form;
once a duration exhausts the risk set (d == r) the curve is pinned to 0
for all later rows (ln(0) is not finite)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from sequenzo_spark.operators.spells import spell_table


def spell_survival(
    df: DataFrame,
    seq_col: str = "seq_id",
    order_col: str = "pos",
    state_col: str = "state",
    weight_col: str | None = None,
    strata_col: str | None = None,
) -> DataFrame:
    """Weighted Kaplan–Meier spell-survival curves.

    ``strata_col`` None → one curve per spell STATE (the reference's
    per-state mode); otherwise a per-turn column (constant within a
    sequence) defining group strata over ALL spells.

    Output: stratum, time, n_risk, n_event, surv, std_err — the
    ``survfit``-style summary rows."""
    spells = spell_table(
        df, seq_col, order_col, state_col, weight_col=weight_col
    )
    wl = Window.partitionBy("seq_id")
    # event iff NOT the sequence's last spell (the last is censored)
    ev = F.col("spell_id") != F.max("spell_id").over(wl)
    w = F.col("weight") if weight_col else F.lit(1.0)
    if strata_col is None:
        stratum = F.col("state")
    else:
        grp = df.groupBy(F.col(seq_col).alias("seq_id")).agg(
            F.first(strata_col).alias("_stratum")
        )
        spells = spells.join(grp, "seq_id")
        stratum = F.col("_stratum")
    rows = spells.select(
        stratum.alias("stratum"),
        F.col("duration").cast("double").alias("time"),
        w.alias("w"),
        ev.alias("ev"),
    )
    agg = rows.groupBy("stratum", "time").agg(
        F.sum(F.when(F.col("ev"), F.col("w")).otherwise(F.lit(0.0))).alias("d"),
        F.sum(F.when(~F.col("ev"), F.col("w")).otherwise(F.lit(0.0))).alias("c"),
        F.sum("w").alias("wt"),
    )
    wfwd = (
        Window.partitionBy("stratum")
        .orderBy("time")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    wcum = (
        Window.partitionBy("stratum")
        .orderBy("time")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    agg = agg.withColumn("n_risk", F.sum("wt").over(wfwd)).filter(
        (F.col("d") > 0) | (F.col("c") > 0)
    )
    d, r = F.col("d"), F.col("n_risk")
    term = F.when((d > 0) & (r > d), F.log(1 - d / r)).otherwise(F.lit(0.0))
    exhausted = F.max(
        F.when((d > 0) & (d >= r), 1).otherwise(0)
    ).over(wcum)
    surv = F.when(exhausted == 1, F.lit(0.0)).otherwise(
        F.exp(F.sum(term).over(wcum))
    )
    gw = F.when(
        (d > 0) & (r > d), d / (r * (r - d))
    ).otherwise(F.lit(0.0))
    se = surv * F.sqrt(F.sum(gw).over(wcum))
    return agg.select(
        "stratum",
        "time",
        F.col("n_risk"),
        d.alias("n_event"),
        surv.alias("surv"),
        se.alias("std_err"),
    )
