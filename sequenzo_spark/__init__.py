"""sequenzo_spark — a from-scratch PySpark-native time-series rollup engine.

Recasts the state-sequence analytics of Liang-Team/Sequenzo (reference at
/root/reference, studied read-only) as continuous aggregates over time buckets
of a long-format transcript table (conv_id, turn_idx, role, text, tool, ts).

Design (see SURVEY.md):
- long format end-to-end; the reference's wide matrix is never materialized;
- every indicator is a DataFrame expression / window function (JVM-side,
  whole-stage codegen); grouped pandas UDFs only where genuinely sequential
  (turbulence subsequence DP, Gorilla codec);
- rollup tiers (1m/1h/1d) carry only *algebraic* state (counts, weighted sums,
  sums of squares, min/max) so higher tiers re-merge lower tiers bit-exactly;
  derived floats (rates, entropy) are recomputed per tier from merged counts.
"""

from sequenzo_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
