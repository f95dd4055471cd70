"""Prefix-tree indicators (position-based: level = time index).

Reference surface (studied, not copied — the reference materializes an
in-memory dict trie; this engine never builds a tree object, it derives the
same quantities from prefix-key aggregates):

- system level — prefix_tree/system_level_indicators.py:
  compute_prefix_count (:110): distinct prefixes per depth t;
  compute_branching_factor (:131): mean number of children over the
  depth-(t−1) prefixes, 0.0 padded at t=1. Every depth-t prefix has exactly
  one depth-(t−1) parent, so the mean children count equals
  n_prefixes(t) / n_prefixes(t−1) — the closed form computed here.
  (The JS-divergence third indicator, :154, is
  operators/distributions.js_divergence_consecutive.)

- individual level — prefix_tree/individual_level_indicators.py:
  prefix rarity (:46, compute_prefix_rarity_per_year): rarity(i,t) =
  −ln(freq(prefix_{i,t}) / N); rarity score = Σ_t rarity (i.e.
  compute_prefix_rarity_score); path uniqueness (compute_path_uniqueness,
  grouped variant :1282): number of depths at which the individual's prefix
  is unique (freq == 1). With ``group_col``, frequencies and N are computed
  within each group (compute_path_uniqueness_by_group_prefix).

The reference requires equal-length sequences; this engine generalizes to
variable lengths: prefix_{i,t} exists for t ≤ len(i), freq counts the
sequences sharing that exact depth-t prefix, and N stays the total
sequence (or group) count — for equal-length inputs the numbers coincide
with the reference's.

Scale shape: ONE window pass builds (seq, t, prefix-key) rows; everything
else is groupBy aggregates on (t, prefix) / seq_id. The prefix key is the
\\x1f-joined state string (portable to the SQL oracle; collision-free).
Its length grows with depth, so the (t, prefix) shuffle carries O(depth)
bytes per row — at extreme depths swap the key for an incremental
xxhash64 chain (same plan, constant-width keys, loses oracle portability).
Per-seq float sums fold in ascending-t order (deterministic bits at any
parallelism — the engine-wide reduction rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SEP = "\x1f"  # unit separator: cannot appear in state labels (validated at ingest)


def _prefix_rows(
    df: DataFrame,
    seq_col: str = "seq_id",
    order_col: str = "pos",
    state_col: str = "state",
) -> DataFrame:
    """(seq_id, t, prefix) — one row per sequence position; prefix = the
    states from the start through t, joined with SEP. One window pass."""
    w = (
        Window.partitionBy(seq_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wr = Window.partitionBy(seq_col).orderBy(order_col)
    return df.select(
        F.col(seq_col).alias("seq_id"),
        F.row_number().over(wr).alias("t"),
        F.concat_ws(SEP, F.collect_list(state_col).over(w)).alias("prefix"),
    )


def prefix_tree_stats(
    df: DataFrame,
    seq_col: str = "seq_id",
    order_col: str = "pos",
    state_col: str = "state",
) -> DataFrame:
    """Per depth t: n_prefixes (distinct prefixes — compute_prefix_count)
    and branching_factor (n_prefixes(t)/n_prefixes(t−1), 0.0 at t=1 —
    compute_branching_factor's padding). The lag window runs over the
    per-depth aggregate (max-sequence-length rows), not data rows."""
    per_t = (
        _prefix_rows(df, seq_col, order_col, state_col)
        .groupBy("t")
        .agg(F.countDistinct("prefix").alias("n_prefixes"))
    )
    wl = Window.orderBy("t")  # max-depth rows — un-partitioned is fine
    prev = F.lag("n_prefixes").over(wl)
    bf = (
        F.when(prev.isNull(), F.lit(0.0))
        .otherwise(F.col("n_prefixes").cast("double") / prev.cast("double"))
    )
    return per_t.select("t", "n_prefixes", bf.alias("branching_factor"))


def prefix_rarity(
    df: DataFrame,
    seq_col: str = "seq_id",
    order_col: str = "pos",
    state_col: str = "state",
    group_col: str | None = None,
) -> DataFrame:
    """Per sequence: rarity_score = Σ_t −ln(freq(prefix_t)/N) and
    path_uniqueness = #{t : freq(prefix_t) == 1}.

    ``group_col`` (a per-turn column, constant within a sequence) switches
    to the within-group variant: freq and N are computed inside each group
    (compute_path_uniqueness_by_group_prefix, individual_level:1282).
    The rarity sum folds in ascending-t order for bit-deterministic output."""
    gcols = [group_col] if group_col else []
    pfx = _prefix_rows(df, seq_col, order_col, state_col)
    if group_col:
        grp = df.groupBy(F.col(seq_col).alias("seq_id")).agg(
            F.first(group_col).alias(group_col)
        )
        pfx = pfx.join(grp, "seq_id")
    # prefix frequency at each depth (within group)
    freq = pfx.groupBy(*gcols, "t", "prefix").agg(
        F.count(F.lit(1)).alias("freq")
    )
    joined = pfx.join(freq, gcols + ["t", "prefix"])
    # N: total sequences (per group)
    n_seqs = (
        joined.select(*gcols, "seq_id")
        .distinct()
        .groupBy(*gcols)
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    if group_col:
        joined = joined.join(F.broadcast(n_seqs), gcols)
    else:
        joined = joined.crossJoin(F.broadcast(n_seqs))
    rar = -F.log(F.col("freq").cast("double") / F.col("_n").cast("double"))
    per_seq = joined.groupBy("seq_id", *gcols).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("t").alias("t"), rar.alias("r")))
        ).alias("_rs"),
        F.sum(F.when(F.col("freq") == 1, 1).otherwise(0))
        .cast("long")
        .alias("path_uniqueness"),
    )
    score = (
        F.aggregate(
            F.col("_rs"), F.lit(0.0), lambda acc, s: acc + s["r"]
        )
        + 0.0  # normalize -0.0 (all-shared prefixes → −ln(1) terms)
    )
    return per_seq.select(
        "seq_id", *gcols, score.alias("rarity_score"), "path_uniqueness"
    )
