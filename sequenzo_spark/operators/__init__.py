from sequenzo_spark.operators.spells import dss, locf_fill, spell_table
from sequenzo_spark.operators.transitions import (
    transition_counts,
    transition_pairs,
    transition_rates,
)
from sequenzo_spark.operators.distributions import (
    cross_sectional_distribution,
    cross_sectional_entropy,
    modal_state,
)
from sequenzo_spark.operators.indicators import sequence_indicators, turbulence
from sequenzo_spark.operators.gapfill import fill_gaps

__all__ = [
    "spell_table",
    "dss",
    "locf_fill",
    "transition_pairs",
    "transition_counts",
    "transition_rates",
    "cross_sectional_distribution",
    "cross_sectional_entropy",
    "modal_state",
    "sequence_indicators",
    "turbulence",
    "fill_gaps",
]
