"""Weighted statistics — Hmisc-compatible weighted mean/variance and the
weighted five-number summary.

Reference semantics (studied, not copied) from
/root/reference/sequenzo/utils/weighted_stats.py:
- weighted mean Σwx/Σw (:27-92);
- weighted variance, unbiased Σw(x−m)²/(Σw−1) or ML /Σw (:95-194);
- weighted fivenum with interpolated quantile indices (:197-336).

Mean/variance are pure aggregate expressions. The exact interpolated
quantiles need the sorted per-group vector → a grouped pandas UDF (Arrow
batches); Spark's percentile_approx is approximate and is NOT used where
bit-exactness matters (SURVEY.md §2.8).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def weighted_mean_var(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    group_cols: list[str] | None = None,
    unbiased: bool = True,
) -> DataFrame:
    """Weighted mean and variance as algebraic aggregates:
    mean = Σwx/Σw; var = (Σwx² − (Σwx)²/Σw) / (Σw − 1 | Σw)."""
    x, w = F.col(value_col), F.col(weight_col)
    g = df.groupBy(*(group_cols or []))
    agg = g.agg(
        F.sum(w).alias("_sw"),
        F.sum(w * x).alias("_swx"),
        F.sum(w * x * x).alias("_swxx"),
        F.count(F.lit(1)).alias("n"),
    )
    mean = F.col("_swx") / F.col("_sw")
    ss = F.col("_swxx") - F.col("_swx") * F.col("_swx") / F.col("_sw")
    denom = (F.col("_sw") - 1) if unbiased else F.col("_sw")
    keep = (group_cols or []) + ["n"]
    return agg.select(
        *keep,
        F.col("_sw").alias("weight_sum"),
        mean.alias("mean"),
        (ss / denom).alias("variance"),
    )


def weighted_fivenum(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Exact weighted five-number summary (min, q1, median, q3, max) per
    group via interpolated weighted quantiles (weighted_stats.py:234-336
    semantics: cumulative-weight positions, linear interpolation), computed
    in a grouped pandas UDF over value-sorted vectors (deterministic order,
    no shuffle dependence)."""
    from sequenzo_spark import ensure_workers_can_import

    ensure_workers_can_import(df.sparkSession)
    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema
        if f.name in group_cols
    )
    schema = (
        f"{key_fields}, minimum double, q1 double, median double, "
        "q3 double, maximum double"
    )

    def fivenum(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(value_col, kind="mergesort")
        x = pdf[value_col].to_numpy(dtype=np.float64)
        w = pdf[weight_col].to_numpy(dtype=np.float64)
        cw = np.cumsum(w)
        tot = cw[-1]
        # interpolated positions: p·(Σw−w̄)+w̄/2 style normalized cum-weights
        pos = (cw - 0.5 * w) / tot
        qs = [np.interp(p, pos, x) for p in (0.25, 0.5, 0.75)]
        out = {k: [pdf[k].iloc[0]] for k in group_cols}
        out.update(
            minimum=[float(x[0])],
            q1=[qs[0]],
            median=[qs[1]],
            q3=[qs[2]],
            maximum=[float(x[-1])],
        )
        return pd.DataFrame(out)

    return df.groupBy(*group_cols).applyInPandas(fivenum, schema=schema)
