"""Multidomain combine — the expanded-alphabet (CombT label-merging) kernel.

Reference semantics (studied, not copied): multidomain/combt.py:55-70
(_assemble_combined_typology joins per-domain labels with '+'), applied to
aligned state sequences (the CAT/expanded-alphabet regime of multidomain/
cat.py). The distance-matrix + clustering stages surrounding it in the
reference are the SURVEY.md §2.9 exclusion (O(n²) at engine scale); the
combine itself is pure relational algebra and belongs in the engine:
ingest.refined_alphabet_col is the same operation for the role⊗tool columns
of one table — this is the N-table generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def combine_domains(
    domains: dict[str, DataFrame],
    sep: str = "+",
    seq_col: str = "seq_id",
    order_col: str = "pos",
    state_col: str = "state",
    how: str = "inner",
) -> DataFrame:
    """Align N long-format domain frames on (seq_id, pos) and merge their
    states into one expanded-alphabet state 'a+b+…' (domain order = dict
    insertion order, matching the reference's domain list order).

    ``how='inner'`` keeps positions observed in EVERY domain (the reference
    requires equal-shape domain matrices); ``'outer'`` keeps all positions
    with '*' for a missing domain state (TraMineR's missing marker in
    expanded alphabets).

    Plan: N−1 equi-joins on the SAME (seq_id, pos) key — after the first
    shuffle every join reuses the existing hash partitioning, so the whole
    combine costs one shuffle per input, zero re-shuffles between joins.
    Output: seq_id, pos, state (+ per-domain state_<name> columns).
    """
    if len(domains) < 2:
        raise ValueError("combine_domains needs at least two domains")
    if how not in ("inner", "outer"):
        raise ValueError("how must be 'inner' or 'outer'")
    out = None
    names = list(domains)
    for name, df in domains.items():
        d = df.select(
            F.col(seq_col).alias("seq_id"),
            F.col(order_col).alias("pos"),
            F.col(state_col).alias(f"state_{name}"),
        )
        out = d if out is None else out.join(
            d, ["seq_id", "pos"], "inner" if how == "inner" else "full_outer"
        )
    parts = [
        F.coalesce(F.col(f"state_{n}"), F.lit("*")) for n in names
    ]
    return out.withColumn("state", F.concat_ws(sep, *parts))


def merge_sparse_types(
    df: DataFrame,
    label_col: str = "state",
    min_size: int = 30,
    other_label: str = "Others",
    weight_col: str | None = None,
) -> DataFrame:
    """Distance-free recast of merge_sparse_combt_types (multidomain/
    combt.py:220-330): relabel combined types whose (weighted) support falls
    below ``min_size`` to ``other_label``.

    The reference merges each sparse type into its silhouette-best NEIGHBOR
    cluster, which requires the full pairwise distance matrix — the SURVEY
    §2.9 exclusion (O(n²) at 10¹² rows). The support-threshold relabel is
    the part of the algorithm that survives engine scale: one count
    aggregation over the label column (tiny — bounded by the expanded
    alphabet size, not row count) broadcast back onto the rows.
    Output: input columns with ``label_col`` rewritten."""
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    sparse = (
        df.groupBy(F.col(label_col).alias("_lbl"))
        .agg(F.sum(w).alias("_n"))
        .filter(F.col("_n") < min_size)
        .select("_lbl")
    )
    out = df.join(
        F.broadcast(sparse), df[label_col] == sparse["_lbl"], "left"
    )
    return out.withColumn(
        label_col,
        F.when(F.col("_lbl").isNotNull(), F.lit(other_label)).otherwise(
            F.col(label_col)
        ),
    ).drop("_lbl")
