"""Feature-extraction builders for downstream ML — duration, timing, and
sequencing features (reference:
feature_extraction_and_selection/duration_timing_feature_builders.py and
sequencing_feature_builders.py, studied not copied; the Boruta/sklearn
selection layer downstream of the matrices is out of scope).

All outputs are LONG format (seq_id, feature, value) — the scalable shape
for wide alphabets/bins; pivot with functions.reshape.long_to_wide when a
matrix is genuinely needed.

- duration_features (build_duration_features :27): DUR_<group> = total
  spell duration (sequence-position steps) in each state group; groups
  default to one group per state.
- timing_features (build_timing_features :61, in_bin
  time_binning_utils.py:77): START_<group>_BIN<i> / END_<group>_BIN<i> —
  spell entry (pos_start) / exit time falling in half-open bins
  ([s, e) when ``bin_include_left`` else (s, e]); value = presence (any)
  or count. ``end_time_mode`` follows monthly_state_to_spells
  extract_spells_with_times :33: "last_observed" = the spell's last
  position, "exit_time" = the next position when one exists.
- sequencing_features (build_sequencing_features :62): mine frequent
  spell-state subsequences (one event per spell — spells_to_event_tse)
  and emit presence/count features per mined pattern; pure composition of
  spell_table + frequent_subsequences + count_subsequence_occurrences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from sequenzo_spark.operators.spells import spell_table


def _groups_or_default(
    df: DataFrame, state_col: str, state_groups: dict[str, list[str]] | None
) -> dict[str, list[str]]:
    if state_groups is not None:
        return {g: list(ss) for g, ss in state_groups.items()}
    states = sorted(r[0] for r in df.select(state_col).distinct().collect())
    return {s: [s] for s in states}


def duration_features(
    df: DataFrame,
    state_groups: dict[str, list[str]] | None = None,
    seq_col: str = "seq_id",
    order_col: str = "pos",
    state_col: str = "state",
) -> DataFrame:
    """(seq_id, feature, value): DUR_<group> totals, dense (0 when a
    group never occurs in a sequence)."""
    groups = _groups_or_default(df, state_col, state_groups)
    spells = spell_table(df, seq_col, order_col, state_col)
    gmap = F.array(
        *[
            F.when(F.col("state").isin(gs), F.lit(g)).otherwise(
                F.lit(None).cast("string")
            )
            for g, gs in groups.items()
        ]
    )
    tagged = spells.select(
        "seq_id",
        F.col("duration").cast("double").alias("d"),
        F.explode(F.filter(gmap, lambda x: x.isNotNull())).alias("g"),
    )
    per = tagged.groupBy("seq_id", "g").agg(F.sum("d").alias("value"))
    seqs = spells.select("seq_id").distinct()
    feats = df.sparkSession.createDataFrame(
        [(g,) for g in groups], "g string"
    )
    dense = seqs.crossJoin(F.broadcast(feats)).join(
        per, ["seq_id", "g"], "left"
    )
    return dense.select(
        "seq_id",
        F.concat(F.lit("DUR_"), F.col("g")).alias("feature"),
        F.coalesce(F.col("value"), F.lit(0.0)).alias("value"),
    )


def timing_features(
    df: DataFrame,
    start_bins: list[tuple[float, float]],
    state_groups: dict[str, list[str]] | None = None,
    include_start: bool = True,
    include_end: bool = False,
    count_method: str = "any",
    bin_include_left: bool = True,
    end_time_mode: str = "last_observed",
    seq_col: str = "seq_id",
    order_col: str = "pos",
    state_col: str = "state",
) -> DataFrame:
    """(seq_id, feature, value): START_<g>_BIN<i> / END_<g>_BIN<i> spell
    entry/exit timing features over position bins."""
    if count_method not in ("any", "count"):
        raise ValueError("count_method must be 'any' or 'count'")
    if end_time_mode not in ("last_observed", "exit_time"):
        raise ValueError("end_time_mode must be 'last_observed' or 'exit_time'")
    groups = _groups_or_default(df, state_col, state_groups)
    spells = spell_table(df, seq_col, order_col, state_col)
    wl = Window.partitionBy("seq_id")
    end_t = F.col("pos_end").cast("double")
    if end_time_mode == "exit_time":
        end_t = F.when(
            F.col("pos_end") < F.max("pos_end").over(wl),
            F.col("pos_end") + 1,
        ).otherwise(F.col("pos_end")).cast("double")
    sp = spells.select(
        "seq_id",
        "state",
        F.col("pos_start").cast("double").alias("_ts"),
        end_t.alias("_te"),
    )
    gmap = F.array(
        *[
            F.when(F.col("state").isin(gs), F.lit(g)).otherwise(
                F.lit(None).cast("string")
            )
            for g, gs in groups.items()
        ]
    )
    tagged = sp.select(
        "seq_id", "_ts", "_te",
        F.explode(F.filter(gmap, lambda x: x.isNotNull())).alias("g"),
    )

    def in_bin(col, lo, hi):
        if bin_include_left:
            return (col >= F.lit(float(lo))) & (col < F.lit(float(hi)))
        return (col > F.lit(float(lo))) & (col <= F.lit(float(hi)))

    aggs = []
    specs = []
    for g in groups:
        for i, (lo, hi) in enumerate(start_bins):
            if include_start:
                specs.append((f"START_{g}_BIN{i + 1}", g, lo, hi, "_ts"))
            if include_end:
                specs.append((f"END_{g}_BIN{i + 1}", g, lo, hi, "_te"))
    for name, g, lo, hi, col in specs:
        hit = F.when(
            (F.col("g") == g) & in_bin(F.col(col), lo, hi), 1.0
        ).otherwise(0.0)
        aggs.append(F.sum(hit).alias(name))
    per = tagged.groupBy("seq_id").agg(*aggs)
    # dense: sequences with no group spells still get all-zero features
    seqs = spells.select("seq_id").distinct()
    per = seqs.join(per, "seq_id", "left")
    # melt to long
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("feature"),
                (
                    F.when(F.col(name) > 0, 1.0).otherwise(0.0)
                    if count_method == "any"
                    else F.coalesce(F.col(name), F.lit(0.0))
                ).alias("value"),
            )
            for name, *_ in specs
        ]
    )
    return per.select("seq_id", F.explode(pairs).alias("e")).select(
        "seq_id", "e.feature", "e.value"
    )


def sequencing_features(
    df: DataFrame,
    max_k: int = 3,
    min_support: float | int = 0.05,
    count_method: str = "presence",
    top_mined_subsequences: int | None = None,
    seq_col: str = "seq_id",
    order_col: str = "pos",
    state_col: str = "state",
) -> DataFrame:
    """(seq_id, feature, value): SEQ_<pattern> presence/count of mined
    frequent spell-state subsequences (one event per spell). A float
    ``min_support`` in (0, 1] is a support ratio; an int is an absolute
    count (the reference's dispatch). The mined pattern list (alphabet-
    bounded) is collected driver-side to parameterize the count pass."""
    from sequenzo_spark.operators.subsequences import (
        count_subsequence_occurrences,
        frequent_subsequences,
    )

    spells = spell_table(df, seq_col, order_col, state_col)
    events = spells.select(
        "seq_id",
        F.col("spell_id").alias("pos"),
        F.col("state").alias("event"),
    )
    if isinstance(min_support, float) and 0 < min_support <= 1:
        mined = frequent_subsequences(
            events, max_k=max_k, min_support_ratio=min_support
        )
    else:
        mined = frequent_subsequences(
            events, max_k=max_k, min_support=float(int(min_support))
        )
    rows = mined.orderBy(F.desc("support"), "subseq").collect()
    if top_mined_subsequences is not None:
        rows = rows[: int(top_mined_subsequences)]
    patterns = [r["subseq"] for r in rows]
    if not patterns:
        return events.select("seq_id").distinct().select(
            "seq_id",
            F.lit(None).cast("string").alias("feature"),
            F.lit(None).cast("double").alias("value"),
        ).filter(F.lit(False))
    counts = count_subsequence_occurrences(
        events, patterns, method=count_method
    )
    return counts.select(
        "seq_id",
        F.concat(F.lit("SEQ_"), F.col("subseq")).alias("feature"),
        F.col("count").cast("double").alias("value"),
    )
