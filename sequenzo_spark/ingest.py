"""Validate + dictionary-encode stage (SURVEY.md §3.1).

Mirrors the reference's SequenceData ingest lifecycle (studied, not copied):
eager validation with rich errors (_validate_parameters,
/root/reference/sequenzo/define_sequence_data.py:267-511), explicit
user-declared alphabet that may be a superset of observed states (:421-440),
1-based integer encoding in declaration order (state_mapping, :795-838), and
missing auto-appended as the extra code K+1 (:517-792).

In Spark the validation is a handful of cheap aggregate assertions over one
scan, and the encoding is a single ``array_position`` expression — no UDF,
dictionary-encoded further by parquet at write time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class ValidationError(ValueError):
    pass


def validate_transcripts(
    df: DataFrame,
    states: list[str],
    seq_col: str = "conv_id",
    order_col: str = "turn_idx",
    state_col: str = "role",
    ts_col: str = "ts",
    strict: bool = True,
) -> dict[str, int]:
    """Fail-fast checks; returns the violation counts it measured.

    - (seq, order) key uniqueness (reference id uniqueness, :444-462)
    - observed states ⊆ declared alphabet (superset allowed, :421-440)
    - ts non-decreasing within each sequence (stable-ordering invariant)
    """
    # NULL-key rows are their own violation class: countDistinct drops
    # tuples containing NULL, so lumping them into dup_keys would misreport
    # a NULL turn_idx as a duplicate (round-1 advisor finding).
    null_key = (F.col(seq_col).isNull() | F.col(order_col).isNull()).cast("long")
    base = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(seq_col).alias("n_seqs"),
        F.sum(null_key).alias("null_keys"),
        (
            F.count(F.lit(1))
            - F.sum(null_key)
            - F.countDistinct(seq_col, order_col)
        ).alias("dup_keys"),
        F.sum(
            (
                F.col(state_col).isNotNull()
                & ~F.col(state_col).isin(states)
            ).cast("long")
        ).alias("out_of_alphabet"),
    ).first()

    w = Window.partitionBy(seq_col).orderBy(order_col)
    nonmono = (
        df.select((F.col(ts_col) < F.lag(ts_col).over(w)).alias("bad"))
        .agg(F.sum(F.col("bad").cast("long")).alias("n"))
        .first()["n"]
        or 0
    )
    report = {
        "n_rows": base["n_rows"],
        "n_seqs": base["n_seqs"],
        "null_keys": base["null_keys"] or 0,
        "dup_keys": base["dup_keys"],
        "out_of_alphabet": base["out_of_alphabet"] or 0,
        "ts_nonmonotonic": nonmono,
    }
    if strict:
        bad = {
            k: v
            for k, v in report.items()
            if k in ("null_keys", "dup_keys", "out_of_alphabet", "ts_nonmonotonic")
            and v
        }
        if bad:
            raise ValidationError(f"transcript validation failed: {bad}")
    return report


def encode_states(
    df: DataFrame,
    states: list[str],
    state_col: str = "role",
    out_col: str = "state_code",
    missing_as_extra: bool = True,
) -> DataFrame:
    """1-based codes in declaration order (state_mapping semantics, :808).

    NULL / out-of-alphabet → code K+1 ('missing' appended as an extra state,
    :815-830) when ``missing_as_extra``, else NULL."""
    pos = F.array_position(
        F.array(*[F.lit(s) for s in states]), F.col(state_col)
    ).cast("int")
    k = len(states)
    code = F.when(pos > 0, pos)
    code = (
        code.otherwise(F.lit(k + 1)) if missing_as_extra
        else code.otherwise(F.lit(None))
    )
    return df.withColumn(out_col, code)


def refined_alphabet_col(
    role_col: str = "role", tool_col: str = "tool"
) -> F.Column:
    """role⊗tool refined alphabet (SURVEY.md §1.2): 'tool:bash', …"""
    return F.when(
        F.col(tool_col).isNotNull(),
        F.concat_ws(":", F.col(role_col), F.col(tool_col)),
    ).otherwise(F.col(role_col))


def index_gap_report(
    df: DataFrame,
    seq_col: str = "conv_id",
    order_col: str = "turn_idx",
) -> dict[str, int]:
    """has_void_in_data recast (define_sequence_data.py:232-236): in the
    long, rows-absent model a 'void' is a HOLE in a sequence's ordinal index
    (turn_idx jumps). Returns how many sequences have holes and the total
    missing positions — one aggregate pass, no window needed:
    holes(seq) = (max_idx − min_idx + 1) − count(rows)."""
    g = df.groupBy(seq_col).agg(
        (
            F.max(order_col) - F.min(order_col) + 1 - F.count(F.lit(1))
        ).alias("_holes")
    )
    r = g.agg(
        F.sum((F.col("_holes") > 0).cast("long")).alias("seqs_with_gaps"),
        F.sum("_holes").alias("missing_positions"),
    ).first()
    return {
        "seqs_with_gaps": int(r["seqs_with_gaps"] or 0),
        "missing_positions": int(r["missing_positions"] or 0),
    }
