"""Feature builders vs pure-Python mirrors of the reference
(feature_extraction_and_selection: duration/timing/sequencing builders)."""

import pytest

from sequenzo_spark.operators.features import (
    duration_features,
    sequencing_features,
    timing_features,
)


def _df(spark, seqs):
    rows = [
        (f"s{i:02d}", p, st)
        for i, seq in enumerate(seqs)
        for p, st in enumerate(seq)
    ]
    return spark.createDataFrame(rows, "seq_id string, pos int, state string")


def _spells(seq):
    """(state, dur, start_pos, end_pos) with 0-based positions."""
    out = []
    for p, s in enumerate(seq):
        if out and out[-1][0] == s:
            out[-1][1] += 1
            out[-1][3] = p
        else:
            out.append([s, 1, p, p])
    return [tuple(x) for x in out]


SEQS = [
    ["A", "A", "B", "C"],
    ["B", "B", "B"],
    ["C", "A", "C", "C", "A"],
    ["A"],
]


def test_duration_features_match_reference(spark):
    groups = {"good": ["A"], "bad": ["B", "C"]}
    got = {
        (r["seq_id"], r["feature"]): r["value"]
        for r in duration_features(_df(spark, SEQS), groups).collect()
    }
    for i, seq in enumerate(SEQS):
        for g, gs in groups.items():
            want = sum(d for st, d, *_ in _spells(seq) if st in gs)
            assert got[(f"s{i:02d}", f"DUR_{g}")] == float(want), (i, g)


def test_duration_default_groups_dense(spark):
    got = {
        (r["seq_id"], r["feature"]): r["value"]
        for r in duration_features(_df(spark, SEQS)).collect()
    }
    # dense: every (seq, state) pair present, zeros included
    assert got[("s03", "DUR_B")] == 0.0
    assert got[("s00", "DUR_A")] == 2.0


@pytest.mark.parametrize("count_method", ["any", "count"])
def test_timing_features_match_reference(spark, count_method):
    groups = {"g": ["A", "C"]}
    bins = [(0.0, 2.0), (2.0, 5.0)]
    got = {
        (r["seq_id"], r["feature"]): r["value"]
        for r in timing_features(
            _df(spark, SEQS), bins, groups, include_start=True,
            include_end=True, count_method=count_method,
        ).collect()
    }
    for i, seq in enumerate(SEQS):
        sps = [s for s in _spells(seq) if s[0] in groups["g"]]
        for b, (lo, hi) in enumerate(bins):
            for which, idx in (("START", 2), ("END", 3)):
                m = sum(1 for s in sps if lo <= s[idx] < hi)
                want = float(m if count_method == "count" else (1 if m else 0))
                key = (f"s{i:02d}", f"{which}_g_BIN{b + 1}")
                assert got[key] == want, (key, count_method)


def test_timing_exit_time_mode(spark):
    # exit time = next position when one exists, else last observed
    seqs = [["A", "A", "B"]]  # spell A ends at pos 1, exit time = 2
    got = {
        r["feature"]: r["value"]
        for r in timing_features(
            _df(spark, seqs), [(2.0, 3.0)], {"g": ["A"]},
            include_start=False, include_end=True,
            end_time_mode="exit_time",
        ).collect()
    }
    assert got["END_g_BIN1"] == 1.0
    got2 = {
        r["feature"]: r["value"]
        for r in timing_features(
            _df(spark, seqs), [(2.0, 3.0)], {"g": ["A"]},
            include_start=False, include_end=True,
        ).collect()
    }
    assert got2["END_g_BIN1"] == 0.0  # last_observed end = 1, not in [2,3)


def test_sequencing_features_composition(spark):
    got = {
        (r["seq_id"], r["feature"]): r["value"]
        for r in sequencing_features(
            _df(spark, SEQS), max_k=2, min_support=0.5
        ).collect()
    }
    # DSS sequences: [A,B,C], [B], [C,A,C,A], [A] → (A) present in 3/4
    assert got[("s00", "SEQ_(A)")] == 1.0
    assert got[("s01", "SEQ_(A)")] == 0.0
    # pattern below support never becomes a feature
    assert ("s00", "SEQ_(B)-(C)") not in got
