"""Spell survival (weighted Kaplan–Meier) vs a sequential NumPy mirror of
the reference estimator (_weighted_kaplan_meier + the status convention
that only a sequence's LAST spell is censored)."""

import random
from collections import defaultdict

import numpy as np
import pytest

from sequenzo_spark.operators.survival import spell_survival


def _df(spark, seqs, weights=None, group=None):
    rows = []
    for i, seq in enumerate(seqs):
        for p, st in enumerate(seq):
            r = [f"s{i:02d}", p, st]
            if weights is not None:
                r.append(float(weights[i]))
            if group is not None:
                r.append(group[i])
            rows.append(tuple(r))
    schema = "seq_id string, pos int, state string"
    if weights is not None:
        schema += ", w double"
    if group is not None:
        schema += ", grp string"
    return spark.createDataFrame(rows, schema)


def _spells(seq):
    out = []
    for s in seq:
        if out and out[-1][0] == s:
            out[-1][1] += 1
        else:
            out.append([s, 1])
    return out


def _ref_km(durations, events, weights):
    """Sequential product mirror of the reference estimator."""
    durations = np.asarray(durations, float)
    events = np.asarray(events, bool)
    weights = np.asarray(weights, float)
    s, var = 1.0, 0.0
    rows = []
    for ti in np.sort(np.unique(durations)):
        at_risk = weights[durations >= ti].sum()
        at = durations == ti
        d = weights[at & events].sum()
        c = weights[at & ~events].sum()
        if d <= 0 and c <= 0:
            continue
        if d > 0 and at_risk > 0:
            s *= 1.0 - d / at_risk
            if at_risk > d:
                var += d / (at_risk * (at_risk - d))
        rows.append((ti, at_risk, d, s, s * np.sqrt(max(var, 0.0))))
    return rows


def _ref_by_state(seqs, weights=None):
    per_state = defaultdict(lambda: ([], [], []))
    w = weights or [1.0] * len(seqs)
    for i, seq in enumerate(seqs):
        sp = _spells(seq)
        for j, (st, dur) in enumerate(sp):
            dd, ee, ww = per_state[st]
            dd.append(dur)
            ee.append(j != len(sp) - 1)  # last spell censored
            ww.append(w[i])
    return {st: _ref_km(*v) for st, v in per_state.items()}


@pytest.mark.parametrize("weighted", [False, True])
def test_km_matches_reference_mirror(spark, weighted):
    rng = random.Random(31)
    seqs = [
        [rng.choice("AB") for _ in range(rng.randint(1, 10))]
        for _ in range(30)
    ]
    weights = [1.0 + (i % 3) * 0.5 for i in range(len(seqs))] if weighted else None
    got = defaultdict(dict)
    for r in spell_survival(
        _df(spark, seqs, weights), weight_col="w" if weighted else None
    ).collect():
        got[r["stratum"]][r["time"]] = r
    want = _ref_by_state(seqs, weights)
    for st, rows in want.items():
        assert set(got[st]) == {t for t, *_ in rows}, st
        for t, nr, d, s, se in rows:
            g = got[st][t]
            assert g["n_risk"] == pytest.approx(nr), (st, t)
            assert g["n_event"] == pytest.approx(d), (st, t)
            assert g["surv"] == pytest.approx(s, rel=1e-12), (st, t)
            assert g["std_err"] == pytest.approx(se, rel=1e-9), (st, t)


def test_km_exhausted_risk_set_pins_zero(spark):
    # two sequences both A,A then B: the A spells (dur 2) are all events
    # → at the last A-duration the risk set empties and surv hits 0
    seqs = [["A", "A", "B"], ["A", "A", "B"]]
    got = {
        (r["stratum"], r["time"]): r for r in spell_survival(_df(spark, seqs)).collect()
    }
    assert got[("A", 2.0)]["surv"] == 0.0
    # B spells are all LAST (censored): surv stays 1
    assert got[("B", 1.0)]["surv"] == pytest.approx(1.0)
    assert got[("B", 1.0)]["n_event"] == 0.0


def test_km_group_strata(spark):
    seqs = [["A", "B"], ["A", "A", "B"], ["B", "A"], ["B", "B", "A"]]
    group = ["g0", "g0", "g1", "g1"]
    got = {
        (r["stratum"], r["time"]): r
        for r in spell_survival(
            _df(spark, seqs, group=group), strata_col="grp"
        ).collect()
    }
    # g0 spells: s0 [A:1(ev), B:1(cens)], s1 [A:2(ev), B:1(cens)]
    # at t=1: risk=4, d=1 → surv 0.75; at t=2: risk=1, d=1 → surv 0
    assert got[("g0", 1.0)]["n_risk"] == 4.0
    assert got[("g0", 1.0)]["surv"] == pytest.approx(0.75)
    assert got[("g0", 2.0)]["surv"] == 0.0
