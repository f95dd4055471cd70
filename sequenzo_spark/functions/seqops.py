"""TraMineR-style sequence string operations — seqconc / seqdecomp / seqsep /
seqshift / seqrecode / seqasnum, recast as column expressions.

Reference semantics (studied, not copied) from
/root/reference/sequenzo/sequence_operations/operations.py:
- seqconc (:49-71): join states 'A-B-C' skipping NA;
- seqdecomp (:74-95): split + right-pad with NA to fixed width;
- seqsep (:98-112): insert separator into a compact string ('ABC'→'A-B-C');
- seqshift (:115-125): shift a sequence by k with NA padding;
- seqrecode (:128-196): state remapping with optional `otherwise`;
- seqasnum (:199-219): 0-based numeric recode, missing excluded.

All operate on either an array<string> column (long format collected per
sequence) or per-row state columns; everything is whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F


def seqconc(states: Column, sep: str = "-") -> Column:
    """Array of states → 'A-B-C', skipping NULLs (operations.py:49-71)."""
    return F.array_join(F.filter(states, lambda s: s.isNotNull()), sep)


def seqdecomp(seq_str: Column, width: int, sep: str = "-") -> Column:
    """'A-B-C' → array padded with NULL to ``width`` (operations.py:74-95)."""
    arr = F.split(seq_str, sep)
    pad = F.array_repeat(F.lit(None).cast("string"), width)
    return F.slice(F.concat(arr, pad), 1, width)


def seqsep(compact: Column, sep: str = "-", width: int = 1) -> Column:
    """'ABC' → 'A-B-C' by fixed-width chunking (operations.py:98-112)."""
    n_chunks = F.ceil(F.length(compact) / width).cast("int")
    idx = F.sequence(F.lit(0), n_chunks - 1)
    chunks = F.transform(
        idx, lambda i: F.substring(compact, (i * width + 1).cast("int"), width)
    )
    return F.array_join(chunks, sep)


def seqshift(
    state_col: str,
    k: int,
    seq_col: str = "seq_id",
    order_col: str = "pos",
) -> Column:
    """Shift states by k within a sequence, NULL-padded
    (operations.py:115-125): positive k delays (lag), negative advances."""
    w = Window.partitionBy(seq_col).orderBy(order_col)
    return F.lag(state_col, k).over(w) if k >= 0 else F.lead(
        state_col, -k
    ).over(w)


def seqrecode(
    state: Column, mapping: dict[str, str], otherwise: str | None = None
) -> Column:
    """Remap states via a literal map; unmapped → ``otherwise`` (or kept)
    (operations.py:128-196)."""
    if not mapping:
        return state
    m = F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv])
    mapped = F.element_at(m, state)
    fallback = F.lit(otherwise) if otherwise is not None else state
    return F.coalesce(mapped, fallback)


def seqasnum(state: Column, states: list[str]) -> Column:
    """0-based numeric recode in declaration order; missing → NULL
    (operations.py:199-219)."""
    pos = F.array_position(F.array(*[F.lit(s) for s in states]), state)
    return F.when(pos > 0, (pos - 1).cast("int")).otherwise(F.lit(None))


def cut_prefix(arr: Column, x: float = 0) -> Column:
    """Truncate a numeric array at its first element < x
    (simple_characteristics.py:201-207 — the reference trims sentinel-padded
    duration rows; in long format this trims collected arrays)."""
    below = F.filter(
        F.transform(arr, lambda v, i: F.when(v < F.lit(x), i + 1)),
        lambda p: p.isNotNull(),
    )
    first_bad = F.when(F.size(below) > 0, F.element_at(below, 1)).otherwise(
        F.size(arr) + 1
    )
    return F.slice(arr, 1, (first_bad - 1).cast("int"))


def find_sequence_occurrences(
    needles,  # DataFrame(seq_id, pos, state) of query sequences
    haystack,  # DataFrame(seq_id, pos, state) to search
    seq_col: str = "seq_id",
    order_col: str = "pos",
    state_col: str = "state",
):
    """seqfind semantics (sequence_operations/operations.py:277-296): for each
    whole sequence in ``needles``, the ids in ``haystack`` whose ENTIRE state
    sequence is identical.

    Spark recast: concatenate both sides to canonical strings (stable
    within-sequence order via array_sort on (pos,state) structs — never
    shuffle order) and semi-join on the string. The needle side is tiny in
    the reference's usage → broadcast; at scale it is a plain equi-join on
    the concat hash.

    States are joined with the \\x1f unit separator (cannot appear inside a
    state token): an empty separator would let distinct sequences collide —
    ['ab','c'] vs ['a','bc'] — and report false matches (the reference's
    seqfind concatenates with '-', operations.py:283)."""
    def conc(df):
        arr = F.array_sort(F.collect_list(F.struct(order_col, state_col)))
        return df.groupBy(F.col(seq_col)).agg(
            F.array_join(
                F.transform(arr, lambda s: s[state_col]), ""
            ).alias("_s")
        )

    n = conc(needles).select(F.col(seq_col).alias("needle_id"), "_s")
    h = conc(haystack).select(F.col(seq_col).alias("match_id"), "_s")
    return n.join(h, "_s").select("needle_id", "match_id")


def get_xtabs(
    df,
    col1: str,
    col2: str,
    weight_col: str | None = None,
):
    """Weighted K1×K2 contingency table of two aligned categorical columns
    (define_sequence_data.py:1267-1293, np.add.at recast as one hash
    aggregation). Output long-form: (v1, v2, weighted_count)."""
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    return (
        df.filter(F.col(col1).isNotNull() & F.col(col2).isNotNull())
        .groupBy(F.col(col1).alias("v1"), F.col(col2).alias("v2"))
        .agg(F.sum(w).alias("weighted_count"))
    )


def to_event_rows(
    df,
    seq_col: str = "seq_id",
    order_col: str = "pos",
    state_col: str = "state",
    ts_col: str | None = None,
    representation: str = "transition",
):
    """STS→TSE export — the named event-sequence surface (seqe2tse /
    from_state_sequences, event_sequences/core.py:233-252, :876-917,
    :1195-1240): one row per EVENT — the initial state entry plus one row per
    state change, in canonical (id, ts/pos, event) order.

    ``representation`` (reference event_representation, core.py:1099-1111):
    - "transition": change events labeled 'prev>new' (default);
    - "state": change events labeled with the entered state.
    The initial event is always the first observed state (diagonal rule,
    core.py:1091-1096).

    Long-format recast: the reference synthesizes timestamps 0,1,2,… from
    wide-matrix column indices; this engine's input is already timestamped,
    so each event row carries the entering turn's actual (pos [, ts]). One
    window pass (lag) + one filter — no shuffle beyond the seq partition.
    """
    if representation not in ("transition", "state"):
        raise ValueError("representation must be 'transition' or 'state'")
    w = Window.partitionBy(seq_col).orderBy(order_col)
    valid = df.filter(F.col(state_col).isNotNull())
    prev = F.lag(state_col).over(w)
    change_lbl = (
        F.concat(prev, F.lit(">"), F.col(state_col))
        if representation == "transition"
        else F.col(state_col)
    )
    event = F.when(prev.isNull(), F.col(state_col)).when(
        prev != F.col(state_col), change_lbl
    )
    cols = [F.col(seq_col).alias("seq_id"), F.col(order_col).alias("pos")]
    if ts_col:
        cols.append(F.col(ts_col).alias("ts"))
    return (
        valid.withColumn("_ev", event)
        .filter(F.col("_ev").isNotNull())
        .select(*cols, F.col("_ev").alias("event"))
    )


def most_frequent_sequences(
    df,
    k: int = 10,
    seq_col: str = "seq_id",
    order_col: str = "pos",
    state_col: str = "state",
    sep: str = "-",
):
    """Top-k whole-sequence patterns by occurrence count — the kernel behind
    the reference's plot_most_frequent_sequences (visualization/
    plot_most_frequent_sequences.py; SURVEY.md §2.6 top-k row).

    Ties broken by seq_str ascending for a deterministic total order. The
    ORDER BY + LIMIT plans as TakeOrderedAndProject (per-partition top-k
    heaps merged on the driver) — never a global sort, so k rows come back
    from any corpus size. Output: seq_str, n_seqs.
    """
    arr = F.array_sort(F.collect_list(F.struct(order_col, state_col)))
    seqs = df.groupBy(F.col(seq_col)).agg(
        F.array_join(F.transform(arr, lambda s: s[state_col]), sep).alias(
            "seq_str"
        )
    )
    counts = seqs.groupBy("seq_str").agg(F.count(F.lit(1)).alias("n_seqs"))
    return counts.orderBy(F.desc("n_seqs"), F.asc("seq_str")).limit(k)
