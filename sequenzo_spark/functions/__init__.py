from sequenzo_spark.functions.seqops import (
    cut_prefix,
    find_sequence_occurrences,
    get_xtabs,
    most_frequent_sequences,
    seqasnum,
    seqconc,
    seqdecomp,
    seqrecode,
    seqsep,
    seqshift,
    to_event_rows,
)
from sequenzo_spark.functions.multidomain import combine_domains, merge_sparse_types
from sequenzo_spark.functions.reshape import (
    long_to_wide,
    person_period,
    wide_to_long,
)
from sequenzo_spark.functions.weighted import (
    weighted_fivenum,
    weighted_mean_var,
)

__all__ = [
    "seqconc",
    "seqdecomp",
    "seqsep",
    "seqshift",
    "seqrecode",
    "seqasnum",
    "cut_prefix",
    "find_sequence_occurrences",
    "get_xtabs",
    "to_event_rows",
    "most_frequent_sequences",
    "combine_domains",
    "merge_sparse_types",
    "wide_to_long",
    "long_to_wide",
    "person_period",
    "weighted_mean_var",
    "weighted_fivenum",
]
