"""Schemas and column conventions.

The engine's native representation is LONG format: one row per turn. The
reference's wide state-sequence matrix (SequenceData,
/root/reference/sequenzo/define_sequence_data.py:64-211) is never
materialized; wide form exists only inside test oracles.

Canonical sequence-frame columns (operators accept overrides):
  seq_id  string   sequence identifier            (transcripts: conv_id)
  pos     long     0-based ordinal within seq     (transcripts: turn_idx)
  state   string   categorical state              (transcripts: role / role⊗tool)
  weight  double   per-sequence weight, default 1 (reference :507-511)
  ts      timestamp optional wall clock
"""

from __future__ import annotations

from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

# Base alphabet for the transcript payload (FIXTURES.md §1); mirrors the
# reference's explicit user-declared `states` list
# (define_sequence_data.py:148-149 — alphabet may be a superset of observed).
ROLE_ALPHABET = ["user", "assistant", "system", "tool"]
TOOL_VALUES = ["bash", "search", "edit", "none"]

# Tier durations in seconds (raw→1m→1h→1d cascade).
TIERS = {"1m": 60, "1h": 3600, "1d": 86400}
