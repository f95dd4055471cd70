"""SHA sequence-history data vs a wide-matrix mirror of the reference
(get_sequence_history_data, left- and right-aligned indexing)."""

import pytest

from sequenzo_spark.functions.history import sequence_history_data


def _df(spark, seqs):
    rows = [
        (f"s{i}", p, st)
        for i, seq in enumerate(seqs)
        for p, st in enumerate(seq)
    ]
    return spark.createDataFrame(rows, "seq_id string, pos int, state string")


def _ref_rows(seqs, times, events, include_present):
    """(seq, t, event, hist_pos, tm, state) tuples per the reference's
    fill loops (left-aligned p-index and right-aligned Tm index)."""
    out = set()
    for i, seq in enumerate(seqs):
        for t in range(1, times[i] + 1):
            ev = bool(events[i]) and t == times[i]
            upto = t if include_present else t - 1
            for p in range(1, upto + 1):
                tm = t - p + (1 if include_present else 0)
                out.add((f"s{i}", t, ev, p, tm, seq[p - 1]))
    return out


@pytest.mark.parametrize("include_present", [False, True])
def test_history_matches_reference(spark, include_present):
    seqs = [["A", "B", "C", "A"], ["B", "A"], ["C"]]
    times = [3, 2, 1]
    events = [True, False, True]
    dur = spark.createDataFrame(
        list(zip([f"s{i}" for i in range(3)], times, events)),
        "seq_id string, time int, event boolean",
    )
    got = {
        (r["seq_id"], r["t"], r["event"], r["hist_pos"], r["tm"], r["state"])
        for r in sequence_history_data(
            _df(spark, seqs), dur, include_present=include_present
        ).collect()
    }
    assert got == _ref_rows(seqs, times, events, include_present)


def test_history_defaults_full_length(spark):
    seqs = [["A", "B"]]
    got = {
        (r["t"], r["event"], r["hist_pos"], r["state"])
        for r in sequence_history_data(_df(spark, seqs)).collect()
    }
    # periods 1..2; t=1 has no past (include_present=False); t=2 sees p=1
    assert got == {(2, True, 1, "A")}


def test_history_rejects_overlong_duration(spark):
    seqs = [["A", "B"]]
    dur = spark.createDataFrame(
        [("s0", 5, True)], "seq_id string, time int, event boolean"
    )
    # validation is folded into the plan (no eager driver job at build
    # time — optimization r6): the error surfaces at the first action
    with pytest.raises(Exception, match="duration exceeds sequence length"):
        sequence_history_data(_df(spark, seqs), dur).collect()
