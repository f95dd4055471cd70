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
