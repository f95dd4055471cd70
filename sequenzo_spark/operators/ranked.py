"""Ranked-state indicators — badness / degradation / precarity / insecurity
(TraMineR seqibad / seqidegrad / seqprecarity; reference:
sequence_characteristics_indicators/ranked_indicators.py, studied not
copied).

State precarity costs (_seqprecstart, :39): by default the alphabet in
``state_order`` (best → worst) gets uniformly spaced costs
linspace(0, 1, K); a user ``costs`` map overrides.

- badness (:134, TraMineR seqibad): Bad = Σ_s cost(s)·integration(s) —
  since integration(s) is the position-power-weighted share of s, this
  collapses to ONE aggregate: Σ_pos cost(state_pos)·pos^p / Σ_pos pos^p.
- degradation (:198, seqidegrad): over DSS/spell transitions j ≥ 2,
  Σ tr[from,to]·sign·integ_j with
    tr: RANK → |cost_to − cost_from|; ONE → 1;
        FREQ/TRATE/TRATEDSS → transition-probability weights with the
        reference's border-effect damping, ADD/INV/LOGINV transform, and
        max-normalization (matrix built driver-side from a K² aggregate);
    sign: +1 to worse / −1 to better per ``penalized``;
    integ_j: spell-position integration j^p/Σ_{m≤j}m^p when
        ``spell_integr`` else 1 (then the sum is normalized by Σ tr·integ);
    ``use_mean_tr`` (the "+" methods) multiplies by mean transition
    weight transw/n_spells.
- precarity (:511, seqprecarity type 1):
  otto·cost(first DSS state) + (1−otto)·ici^a·(1+correction)^b with
  correction = degradation(spell_integr=False, method) — method default
  TRATEDSS as the reference.
- insecurity (:601, seqprecarity type 2):
  cost(first state)·integr1 + (ici + correction) with integr1 =
  1/Σ_{m=1..d₁} m^spow (the first spell's first-position integration
  weight) and correction = degradation(spell_integr=True, method=RANK);
  ``bound`` clamps into [min, max] cost over the sequence's DSS states.

Equivalence classes / non-ranked states (state_equiv, state_noncomp) are
not supported — pass explicit ``costs`` instead (equal costs reproduce an
equivalence class for RANK/badness, where only costs enter).

Scale shape: per-sequence aggregates over turn/spell rows; every matrix
is K×K (alphabet-sized) — built from a K² aggregate collected driver-side
and re-broadcast as literal map expressions."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from sequenzo_spark.operators.spells import spell_table


def state_precarity_costs(
    state_order: list[str],
    costs: dict[str, float] | None = None,
) -> dict[str, float]:
    """Default uniformly spaced costs over ``state_order`` (best→worst),
    or a copy of the user map (_seqprecstart's default branch)."""
    if costs is not None:
        return dict(costs)
    k = len(state_order)
    if k == 1:
        return {state_order[0]: 0.0}
    return {s: i / (k - 1) for i, s in enumerate(state_order)}


def _alphabet(df: DataFrame, state_col: str) -> list[str]:
    # metadata-scale driver collect (K values), like the reference's
    # alphabet() — pass state_order explicitly to avoid it
    return sorted(
        r[0] for r in df.select(state_col).distinct().collect()
    )


def _cost_expr(costs: dict[str, float], col):
    m = F.create_map(
        *[x for s, c in sorted(costs.items()) for x in (F.lit(s), F.lit(float(c)))]
    )
    return m[col]


def badness_index(
    df: DataFrame,
    power: float = 1.0,
    state_order: list[str] | None = None,
    costs: dict[str, float] | None = None,
    seq_col: str = "seq_id",
    order_col: str = "pos",
    state_col: str = "state",
) -> DataFrame:
    """seqibad: Σ_pos cost(state)·pos^p / Σ_pos pos^p per sequence."""
    if state_order is None:
        state_order = _alphabet(df, state_col)
    cmap = state_precarity_costs(state_order, costs)
    w = Window.partitionBy(seq_col).orderBy(order_col)
    valid = df.filter(F.col(state_col).isNotNull())
    pw = F.pow(F.row_number().over(w).cast("double"), F.lit(float(power)))
    return (
        valid.withColumn("_pw", pw)
        .groupBy(F.col(seq_col).alias("seq_id"))
        .agg(
            (
                F.sum(_cost_expr(cmap, F.col(state_col)) * F.col("_pw"))
                / F.sum("_pw")
            ).alias("badness")
        )
    )


def _trate_weight_map(
    spells: DataFrame,
    state_order: list[str],
    method: str,
    weight_type: str,
    border_effect: float,
    from_dss: bool,
    df: DataFrame,
    seq_col: str,
    order_col: str,
    state_col: str,
) -> dict[tuple[str, str], float]:
    """K×K transition-probability weight matrix, reference steps
    (:382-410): rates (or global frequencies for FREQ) → zero diagonal →
    border-effect damping → ADD/INV/LOGINV transform → divide by the max
    positive entry. Built from a K² aggregate collected to the driver."""
    import numpy as np

    if from_dss:
        src = spells
        wwin = Window.partitionBy("seq_id").orderBy("spell_id")
        frm = F.lag("state").over(wwin)
        pairs = (
            src.withColumn("_frm", frm)
            .filter(F.col("_frm").isNotNull())
            .groupBy("_frm", "state")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    else:
        wwin = Window.partitionBy(seq_col).orderBy(order_col)
        frm = F.lag(state_col).over(wwin)
        pairs = (
            df.withColumn("_frm", frm)
            .filter(F.col("_frm").isNotNull())
            .groupBy(F.col("_frm"), F.col(state_col).alias("state"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    k = len(state_order)
    idx = {s: i for i, s in enumerate(state_order)}
    cnt = np.zeros((k, k))
    for r in pairs:
        cnt[idx[r["_frm"]], idx[r["state"]]] += r["n"]
    if method == "FREQ":
        tot = cnt.sum()
        tr = cnt / tot if tot > 0 else cnt
    else:  # TRATE / TRATEDSS: row-normalized rates
        rows = cnt.sum(axis=1, keepdims=True)
        with np.errstate(invalid="ignore", divide="ignore"):
            tr = np.where(rows > 0, cnt / rows, 0.0)
    np.fill_diagonal(tr, 0.0)
    eps = 1e-10
    if np.any(tr > 1 - 0.1 / border_effect):
        tr = tr - tr / border_effect
    if weight_type == "ADD":
        tr = 1 - tr
    elif weight_type == "INV":
        tr = (1 + eps) / (tr + eps)
    elif weight_type == "LOGINV":
        tr = np.log((1 + eps) / (tr + eps))
    else:
        raise ValueError("weight_type must be ADD, INV or LOGINV")
    pos = tr[tr > 0]
    if pos.size:
        tr = tr / pos.max()
    np.fill_diagonal(tr, 0.0)
    return {
        (a, b): float(tr[idx[a], idx[b]])
        for a in state_order
        for b in state_order
    }


def degradation_index(
    df: DataFrame,
    method: str = "RANK",
    penalized: str = "BOTH",
    weight_type: str = "ADD",
    power: float = 1.0,
    spell_integr: bool = True,
    border_effect: float = 10.0,
    state_order: list[str] | None = None,
    costs: dict[str, float] | None = None,
    seq_col: str = "seq_id",
    order_col: str = "pos",
    state_col: str = "state",
) -> DataFrame:
    """seqidegrad over spell (DSS) transitions — see module docstring.
    The "+" method suffix (use_mean_tr) is accepted (e.g. "RANK+")."""
    use_mean_tr = method.endswith("+")
    if use_mean_tr:
        method = method[:-1]
    if method not in ("RANK", "ONE", "FREQ", "TRATE", "TRATEDSS"):
        raise ValueError(f"unsupported method {method!r}")
    if penalized not in ("NEG", "POS", "BOTH", "NO"):
        raise ValueError("penalized must be NEG, POS, BOTH or NO")
    if state_order is None:
        state_order = _alphabet(df, state_col)
    cmap = state_precarity_costs(state_order, costs)
    spells = spell_table(df, seq_col, order_col, state_col)
    if penalized == "NO":
        return spells.select("seq_id").distinct().select(
            "seq_id", F.lit(0.0).alias("degradation")
        )
    wwin = Window.partitionBy("seq_id").orderBy("spell_id")
    frm = F.lag("state").over(wwin)
    sp = spells.withColumn("_frm", frm)
    cf = _cost_expr(cmap, F.col("_frm"))
    ct = _cost_expr(cmap, F.col("state"))
    # rank order = ascending cost; ties (equal user costs) = equivalence
    # classes, sign 0 exactly as the reference's equiv handling
    to_worse = ct > cf
    to_better = ct < cf
    if penalized == "BOTH":
        sign = F.when(to_worse, 1.0).when(to_better, -1.0).otherwise(0.0)
    elif penalized == "NEG":
        sign = F.when(to_worse, 1.0).otherwise(0.0)
    else:  # POS
        sign = F.when(to_better, -1.0).otherwise(0.0)
    if method == "RANK":
        tr = F.abs(ct - cf)
    elif method == "ONE":
        tr = F.when(F.col("_frm") != F.col("state"), 1.0).otherwise(0.0)
    else:
        wmap = _trate_weight_map(
            spells, state_order, method, weight_type, border_effect,
            from_dss=(method == "TRATEDSS"), df=df, seq_col=seq_col,
            order_col=order_col, state_col=state_col,
        )
        m = F.create_map(
            *[
                x
                for (a, b), v in sorted(wmap.items())
                for x in (F.concat(F.lit(a), F.lit("\x1f"), F.lit(b)), F.lit(v))
            ]
        )
        tr = m[F.concat(F.col("_frm"), F.lit("\x1f"), F.col("state"))]
    p = float(power)
    j = F.col("spell_id").cast("double")
    if spell_integr:
        den = F.aggregate(
            F.sequence(F.lit(1), F.col("spell_id")),
            F.lit(0.0),
            lambda acc, x: acc + F.pow(x.cast("double"), F.lit(p)),
        )
        integ = F.pow(j, F.lit(p)) / den
    else:
        integ = F.lit(1.0)
    has = F.col("_frm").isNotNull()
    per = sp.groupBy("seq_id").agg(
        F.sum(F.when(has, tr * integ).otherwise(0.0)).alias("_tw"),
        F.sum(F.when(has, tr * sign * integ).otherwise(0.0)).alias("_tp"),
        F.max("spell_id").alias("_nsp"),
    )
    if spell_integr:
        prop = F.when(F.col("_tw") > 0, F.col("_tp")).otherwise(0.0)
    else:
        prop = F.when(
            F.col("_tw") > 0, F.col("_tp") / F.col("_tw")
        ).otherwise(0.0)
    if use_mean_tr:
        prop = F.when(
            F.col("_tw") > 0,
            (F.col("_tw") / F.col("_nsp").cast("double")) * prop,
        ).otherwise(0.0)
    return per.select("seq_id", prop.alias("degradation"))


def _ici(df, n_states, seq_col, order_col, state_col):
    from sequenzo_spark.operators.indicators import sequence_indicators

    return sequence_indicators(
        df, n_states=n_states, seq_col=seq_col, order_col=order_col,
        state_col=state_col,
    ).select("seq_id", F.col("complexity").alias("_ici"))


def _first_spell(df, seq_col, order_col, state_col):
    spells = spell_table(df, seq_col, order_col, state_col)
    return spells.filter(F.col("spell_id") == 1).select(
        "seq_id",
        F.col("state").alias("_s1"),
        F.col("duration").alias("_d1"),
    )


def precarity_index(
    df: DataFrame,
    otto: float = 0.2,
    a: float = 1.0,
    b: float = 1.2,
    method: str = "TRATEDSS",
    state_order: list[str] | None = None,
    costs: dict[str, float] | None = None,
    seq_col: str = "seq_id",
    order_col: str = "pos",
    state_col: str = "state",
) -> DataFrame:
    """seqprecarity (type 1): otto·cost(first DSS state) +
    (1−otto)·ici^a·(1+correction)^b, correction =
    degradation(spell_integr=False, method)."""
    if state_order is None:
        state_order = _alphabet(df, state_col)
    cmap = state_precarity_costs(state_order, costs)
    corr = degradation_index(
        df, method=method, spell_integr=False, state_order=state_order,
        costs=costs, seq_col=seq_col, order_col=order_col,
        state_col=state_col,
    ).select("seq_id", F.col("degradation").alias("_corr"))
    ici = _ici(df, len(state_order), seq_col, order_col, state_col)
    first = _first_spell(df, seq_col, order_col, state_col)
    out = first.join(ici, "seq_id").join(corr, "seq_id")
    prec = F.lit(float(otto)) * _cost_expr(cmap, F.col("_s1")) + F.lit(
        1.0 - float(otto)
    ) * F.pow(F.col("_ici"), F.lit(float(a))) * F.pow(
        1 + F.col("_corr"), F.lit(float(b))
    )
    return out.select("seq_id", prec.alias("precarity"))


def insecurity_index(
    df: DataFrame,
    power: float = 1.0,
    spow: float | None = None,
    bound: bool = False,
    method: str = "RANK",
    state_order: list[str] | None = None,
    costs: dict[str, float] | None = None,
    seq_col: str = "seq_id",
    order_col: str = "pos",
    state_col: str = "state",
) -> DataFrame:
    """seqprecarity (type 2): cost(first state)·integr1 + ici + correction,
    correction = degradation(spell_integr=True, power, method); integr1 =
    1/Σ_{m=1..d₁} m^spow; ``bound`` clamps into the sequence's DSS
    cost range."""
    if spow is None:
        spow = power
    if state_order is None:
        state_order = _alphabet(df, state_col)
    cmap = state_precarity_costs(state_order, costs)
    corr = degradation_index(
        df, method=method, spell_integr=True, power=power,
        state_order=state_order, costs=costs, seq_col=seq_col,
        order_col=order_col, state_col=state_col,
    ).select("seq_id", F.col("degradation").alias("_corr"))
    ici = _ici(df, len(state_order), seq_col, order_col, state_col)
    first = _first_spell(df, seq_col, order_col, state_col)
    sp = float(spow)
    integr1 = F.lit(1.0) / F.aggregate(
        F.sequence(F.lit(1), F.col("_d1").cast("int")),
        F.lit(0.0),
        lambda acc, x: acc + F.pow(x.cast("double"), F.lit(sp)),
    )
    out = first.join(ici, "seq_id").join(corr, "seq_id")
    insec = _cost_expr(cmap, F.col("_s1")) * integr1 + (
        F.col("_ici") + F.col("_corr")
    )
    if bound:
        spells = spell_table(df, seq_col, order_col, state_col)
        rng = spells.groupBy("seq_id").agg(
            F.min(_cost_expr(cmap, F.col("state"))).alias("_lo"),
            F.max(_cost_expr(cmap, F.col("state"))).alias("_hi"),
        )
        out = out.join(rng, "seq_id")
        insec = F.least(F.greatest(insec, F.col("_lo")), F.col("_hi"))
    return out.select("seq_id", insec.alias("insecurity"))
