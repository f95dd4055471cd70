from sequenzo_spark.functions.seqops import (
    seqasnum,
    seqconc,
    seqdecomp,
    seqrecode,
    seqsep,
    seqshift,
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
    "weighted_mean_var",
    "weighted_fivenum",
]
