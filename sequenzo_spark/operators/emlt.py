"""EMLT — transition-timing situation analysis (TraMineRextras ``seqemlt``).

Reference surface (studied, not copied): /root/reference/sequenzo/emlt/
seqemlt.py — situation = (state, period) cell; the pipeline is
situation frequencies → weighted situation co-occurrence transition rates
(:87) → time-discounted row-normalized profiles (:113) → squared-Euclidean
profile distances over observed situations (:143) → Benzécri
double-centering (:178) → ``princomp(cor=TRUE)`` PCA (:218) → sequence
coordinates ``disjunctive × scores`` (:254).

Spark-first split: everything DATA-sized is distributed —
``situation_frequencies`` and ``situation_cooccurrence`` are aggregates /
a per-sequence self-equijoin over (seq, t, state) rows, and the final
sequence coordinates are a broadcast join of the tiny (situation → score
vector) table re-aggregated per sequence. Everything SITUATION-sized
(S = |alphabet| × periods, typically ≤ a few hundred) is dense driver-side
NumPy: profiles, distances, Benzécri, and the PCA are S×S matrices whose
size is independent of the number of sequences — collecting them is
metadata-scale, not data-scale.

The reference requires rectangular (equal-length) input; this engine
simply uses whichever (seq, t) cells exist — for rectangular input the
numbers coincide.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def _rows(df, seq_col, order_col, state_col, weight_col):
    w = (
        F.col(weight_col).cast("double")
        if weight_col
        else F.lit(1.0)
    )
    return df.select(
        F.col(seq_col).alias("seq_id"),
        F.col(order_col).cast("int").alias("t"),
        F.col(state_col).alias("s"),
        w.alias("w"),
    )


def situation_frequencies(
    df: DataFrame,
    seq_col: str = "seq_id",
    order_col: str = "pos",
    state_col: str = "state",
    weight_col: str | None = None,
) -> DataFrame:
    """Weighted sequence count per situation (state, t) — the reference's
    inner ``freq`` (seqemlt.py:46). Unweighted counts use w = 1."""
    return (
        _rows(df, seq_col, order_col, state_col, weight_col)
        .groupBy("t", "s")
        .agg(F.sum("w").alias("freq"))
    )


def situation_cooccurrence(
    df: DataFrame,
    seq_col: str = "seq_id",
    order_col: str = "pos",
    state_col: str = "state",
    weight_col: str | None = None,
) -> DataFrame:
    """Weighted co-occurrence counts between situation pairs with
    t_j ≥ t_i, plus the source situation's weight: rate = cooc / nb_i is
    the reference's ``transrate`` (seqemlt.py:87 — ``disj_w[:,i] @
    disj_w[:,j] / disj_w[:,i].sum()``, restated as a per-sequence
    self-equijoin: each sequence occupies one situation per period, so the
    dot product counts sequences occupying both cells).

    Output: ti, si, tj, sj, cooc, nb, rate — only OBSERVED pairs (absent
    pairs have cooc 0; unobserved source situations are the reference's
    NaN rows). The join is an equijoin on seq_id; the pair fan-out is
    T²/2 per sequence — bounded by period count, not data volume."""
    rows = _rows(df, seq_col, order_col, state_col, weight_col)
    a, b = rows.alias("a"), rows.alias("b")
    cooc = (
        a.join(b, F.col("a.seq_id") == F.col("b.seq_id"))
        .filter(F.col("b.t") >= F.col("a.t"))
        .groupBy(
            F.col("a.t").alias("ti"),
            F.col("a.s").alias("si"),
            F.col("b.t").alias("tj"),
            F.col("b.s").alias("sj"),
        )
        # the reference's weighted dot product is disj_w[:,i]·disj_w[:,j]
        # — BOTH sides carry the weight, so a co-occurring sequence
        # contributes w² (its nb denominator carries w once)
        .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("cooc"))
    )
    nb = situation_frequencies(
        df, seq_col, order_col, state_col, weight_col
    ).select(
        F.col("t").alias("ti"), F.col("s").alias("si"),
        F.col("freq").alias("nb"),
    )
    return cooc.join(F.broadcast(nb), ["ti", "si"]).select(
        "ti", "si", "tj", "sj", "cooc", "nb",
        (F.col("cooc") / F.col("nb")).alias("rate"),
    )


def _princomp_cor(x: np.ndarray) -> dict:
    """R ``stats::princomp(x, cor=TRUE)`` scores: divisor-n covariance
    (``cov.wt`` then ×(1−1/n)), correlation scaling, eigendecomposition
    sorted by descending eigenvalue, eigenvector columns sign-fixed so
    their first element is non-negative (seqemlt.py:218 documents the
    same R conventions)."""
    z = np.asarray(x, dtype=float)
    n = z.shape[0]
    c = z - z.mean(axis=0)
    cov = (c.T @ c) / n  # (n-1) divisor × (1 - 1/n) == divisor n
    sd = np.sqrt(np.diag(cov))
    if np.any(sd == 0):
        raise ValueError("princomp(cor=TRUE) undefined with a constant column")
    corr = cov / np.outer(sd, sd)
    vals, vecs = np.linalg.eigh(corr)
    order = np.argsort(vals)[::-1]
    vals, vecs = vals[order], vecs[:, order]
    flip = vecs[0, :] < 0
    vecs[:, flip] *= -1.0
    scores = ((z - z.mean(axis=0)) / sd) @ vecs
    return {
        "scores": scores,
        "sdev": np.sqrt(np.clip(vals, 0.0, None)),
        "loadings": vecs,
    }


def emlt(
    df: DataFrame,
    a: float = 1.0,
    b: float = 1.0,
    seq_col: str = "seq_id",
    order_col: str = "pos",
    state_col: str = "state",
    weight_col: str | None = None,
) -> dict:
    """Full seqemlt pipeline. Distributed: frequencies, co-occurrence,
    and the final per-sequence coordinates. Driver-side (S×S, S =
    situations): profiles, distances, Benzécri, PCA.

    Returns dict with:
      situations  — list of (state, t) in the reference's state-major,
                    time-ascending order, OBSERVED ones only (the
                    reference's "active" set);
      freq        — np.ndarray of situation weights;
      transrate   — S×S upper-triangular rate matrix (0.0 below);
      profiles    — S×S time-discounted row-normalized profiles;
      distances   — S×S squared-Euclidean profile distances;
      benz        — Benzécri double-centered covariance;
      pca         — dict(scores, sdev, loadings);
      coord       — Spark DataFrame (seq_id, axis, coord): the sequence's
                    disjunctive row times the PCA score matrix, i.e. the
                    sum of its situations' score vectors (axis 1-indexed,
                    descending eigenvalue order)."""
    spark = df.sparkSession
    freq_rows = situation_frequencies(
        df, seq_col, order_col, state_col, weight_col
    ).collect()
    # reference order: state-major within each period, periods ascending;
    # restrict to observed situations (the reference's `active` filter —
    # unobserved rows/cols are all-NaN there and excluded from benz/PCA)
    states = sorted({r["s"] for r in freq_rows})
    periods = sorted({r["t"] for r in freq_rows})
    freq_map = {(r["s"], r["t"]): float(r["freq"]) for r in freq_rows}
    situations = [
        (s, t) for t in periods for s in states if (s, t) in freq_map
    ]
    S = len(situations)
    sit_idx = {st: i for i, st in enumerate(situations)}
    freq = np.array([freq_map[st] for st in situations])

    # zeros init exactly like the reference's `transrate` (its lower
    # triangle stays 0.0; NaN arises only for UNOBSERVED source
    # situations, which the observed-only situation set excludes; a
    # sequence occupies one situation per period, so unseen upper pairs
    # genuinely co-occur 0)
    rates = np.zeros((S, S))
    sit_t = np.array([t for (_s, t) in situations])
    for r in situation_cooccurrence(
        df, seq_col, order_col, state_col, weight_col
    ).collect():
        i = sit_idx[(r["si"], r["ti"])]
        j = sit_idx[(r["sj"], r["tj"])]
        rates[i, j] = float(r["rate"])

    # time-discounted profiles, row-normalized (reference `profil`): the
    # j < i cells stay 0 (not NaN) exactly as the reference initializes
    profiles = np.zeros((S, S))
    for i in range(S):
        mask = sit_t >= sit_t[i]
        beta = a * (sit_t[mask] - sit_t[i]) + b
        row = np.zeros(S)
        row[mask] = rates[i, mask] / beta
        profiles[i] = row / row.sum()

    # squared-Euclidean distances scaled by column sums (reference
    # `distsquare`); all situations here are observed, so no NaN band
    col_sums = profiles.sum(axis=0)
    d = np.zeros((S, S))
    for i in range(S):
        dp = profiles[i] - profiles
        d[i] = np.sum(dp * dp / col_sums, axis=1)

    row_mean = d.mean(axis=1, keepdims=True)
    col_mean = d.mean(axis=0, keepdims=True)
    benz = -0.5 * (d - row_mean - col_mean + row_mean.mean())

    pca = _princomp_cor(benz)

    # sequence coordinates: broadcast (t, s) → score row; per-seq sum
    score_rows = [
        (situations[i][1], situations[i][0], [float(v) for v in pca["scores"][i]])
        for i in range(S)
    ]
    scores_df = spark.createDataFrame(
        score_rows, "t int, s string, vec array<double>"
    )
    rows = _rows(df, seq_col, order_col, state_col, weight_col)
    joined = rows.join(F.broadcast(scores_df), ["t", "s"])
    coord = (
        joined.select(
            "seq_id", F.posexplode("vec").alias("ax0", "v")
        )
        .groupBy("seq_id", (F.col("ax0") + 1).alias("axis"))
        .agg(F.sum("v").alias("coord"))
    )
    return {
        "situations": situations,
        "freq": freq,
        "transrate": rates,
        "profiles": profiles,
        "distances": d,
        "benz": benz,
        "pca": pca,
        "coord": coord,
    }
