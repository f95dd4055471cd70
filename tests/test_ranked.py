"""Ranked-state indicators (seqibad / seqidegrad / seqprecarity /
seqinsecurity) vs pure-Python mirrors of the reference algorithms
(sequence_characteristics_indicators/ranked_indicators.py)."""

import math
import random

import numpy as np
import pytest

from sequenzo_spark.operators.ranked import (
    badness_index,
    degradation_index,
    insecurity_index,
    precarity_index,
    state_precarity_costs,
)


def _df(spark, seqs):
    rows = [
        (f"s{i:02d}", p, st)
        for i, seq in enumerate(seqs)
        for p, st in enumerate(seq)
    ]
    return spark.createDataFrame(rows, "seq_id string, pos int, state string")


def _dss(seq):
    out = []
    for s in seq:
        if not out or out[-1] != s:
            out.append(s)
    return out


def _ref_badness(seq, costs, p=1.0):
    num = sum(costs[s] * (i + 1) ** p for i, s in enumerate(seq))
    den = sum((i + 1) ** p for i in range(len(seq)))
    return num / den


def _ref_degradation(seq, costs, p=1.0, spell_integr=True, penalized="BOTH",
                     tr_lookup=None, use_mean_tr=False):
    dss = _dss(seq)
    transw = transpen = 0.0
    for j in range(2, len(dss) + 1):
        cf, ct = costs[dss[j - 2]], costs[dss[j - 1]]
        tr = abs(ct - cf) if tr_lookup is None else tr_lookup[(dss[j - 2], dss[j - 1])]
        if penalized == "BOTH":
            sign = 1.0 if ct > cf else (-1.0 if ct < cf else 0.0)
        elif penalized == "NEG":
            sign = 1.0 if ct > cf else 0.0
        else:
            sign = -1.0 if ct < cf else 0.0
        integ = (
            j ** p / sum(m ** p for m in range(1, j + 1))
            if spell_integr
            else 1.0
        )
        transw += tr * integ
        transpen += tr * sign * integ
    if spell_integr:
        d = transpen if transw > 0 else 0.0
    else:
        d = transpen / transw if transw > 0 else 0.0
    if use_mean_tr and transw > 0:
        d = (transw / len(dss)) * d
    return d


def _ref_ici(seq, k):
    L = len(seq)
    trans = sum(1 for i in range(1, L) if seq[i] != seq[i - 1])
    tn = 0.0 if L <= 1 else trans / (L - 1)
    from collections import Counter

    cnt = Counter(seq)
    ent = -sum(c / L * math.log(c / L) for c in cnt.values())
    return math.sqrt(tn * (ent / math.log(k)))


def _ref_tratedss_weights(seqs, order, border_effect=10.0):
    k = len(order)
    idx = {s: i for i, s in enumerate(order)}
    cnt = np.zeros((k, k))
    for seq in seqs:
        d = _dss(seq)
        for a, b in zip(d, d[1:]):
            cnt[idx[a], idx[b]] += 1
    rows = cnt.sum(axis=1, keepdims=True)
    with np.errstate(invalid="ignore", divide="ignore"):
        tr = np.where(rows > 0, cnt / rows, 0.0)
    np.fill_diagonal(tr, 0.0)
    if np.any(tr > 1 - 0.1 / border_effect):
        tr = tr - tr / border_effect
    tr = 1 - tr  # ADD
    pos = tr[tr > 0]
    if pos.size:
        tr = tr / pos.max()
    np.fill_diagonal(tr, 0.0)
    return {(a, b): tr[idx[a], idx[b]] for a in order for b in order}



def _toy(seed=11, n=18, tmax=9):
    rng = random.Random(seed)
    return [
        [rng.choice("ABC") for _ in range(rng.randint(1, tmax))]
        for _ in range(n)
    ]


def test_badness_matches_reference(spark):
    seqs = _toy()
    costs = state_precarity_costs(sorted({s for q in seqs for s in q}))
    got = {r["seq_id"]: r["badness"]
           for r in badness_index(_df(spark, seqs), power=1.5).collect()}
    for i, seq in enumerate(seqs):
        assert got[f"s{i:02d}"] == pytest.approx(
            _ref_badness(seq, costs, 1.5)
        ), i


@pytest.mark.parametrize("spell_integr", [True, False])
@pytest.mark.parametrize("penalized", ["BOTH", "NEG", "POS"])
def test_degradation_rank_matches_reference(spark, spell_integr, penalized):
    seqs = _toy(seed=3)
    costs = state_precarity_costs(sorted({s for q in seqs for s in q}))
    got = {
        r["seq_id"]: r["degradation"]
        for r in degradation_index(
            _df(spark, seqs), spell_integr=spell_integr, penalized=penalized
        ).collect()
    }
    for i, seq in enumerate(seqs):
        want = _ref_degradation(
            seq, costs, spell_integr=spell_integr, penalized=penalized
        )
        assert got[f"s{i:02d}"] == pytest.approx(want), (i, seq)


def test_degradation_rank_plus_mean_tr(spark):
    seqs = _toy(seed=5)
    costs = state_precarity_costs(sorted({s for q in seqs for s in q}))
    got = {
        r["seq_id"]: r["degradation"]
        for r in degradation_index(_df(spark, seqs), method="RANK+").collect()
    }
    for i, seq in enumerate(seqs):
        want = _ref_degradation(seq, costs, use_mean_tr=True)
        assert got[f"s{i:02d}"] == pytest.approx(want), i


def test_degradation_tratedss_matches_reference(spark):
    seqs = _toy(seed=7)
    order = sorted({s for q in seqs for s in q})
    costs = state_precarity_costs(order)
    wmap = _ref_tratedss_weights(seqs, order)
    got = {
        r["seq_id"]: r["degradation"]
        for r in degradation_index(
            _df(spark, seqs), method="TRATEDSS", spell_integr=False
        ).collect()
    }
    for i, seq in enumerate(seqs):
        want = _ref_degradation(
            seq, costs, spell_integr=False, tr_lookup=wmap
        )
        assert got[f"s{i:02d}"] == pytest.approx(want), (i, seq)


def test_precarity_and_insecurity_match_reference(spark):
    seqs = _toy(seed=9)
    order = sorted({s for q in seqs for s in q})
    costs = state_precarity_costs(order)
    k = len(order)
    wmap = _ref_tratedss_weights(seqs, order)
    prec = {
        r["seq_id"]: r["precarity"]
        for r in precarity_index(_df(spark, seqs)).collect()
    }
    insec = {
        r["seq_id"]: r["insecurity"]
        for r in insecurity_index(_df(spark, seqs)).collect()
    }
    for i, seq in enumerate(seqs):
        corr1 = _ref_degradation(seq, costs, spell_integr=False, tr_lookup=wmap)
        ici = _ref_ici(seq, k)
        want_p = 0.2 * costs[_dss(seq)[0]] + 0.8 * (ici ** 1.0) * (1 + corr1) ** 1.2
        assert prec[f"s{i:02d}"] == pytest.approx(want_p), (i, seq)
        corr2 = _ref_degradation(seq, costs, spell_integr=True)
        # first spell duration
        d1 = 1
        while d1 < len(seq) and seq[d1] == seq[0]:
            d1 += 1
        integr1 = 1.0 / sum(m for m in range(1, d1 + 1))
        want_i = costs[seq[0]] * integr1 + ici + corr2
        assert insec[f"s{i:02d}"] == pytest.approx(want_i), (i, seq)


def test_insecurity_bound_clamps(spark):
    seqs = [["C", "A", "C", "A", "C"], ["A"], ["B", "C"]]
    order = ["A", "B", "C"]
    got = {
        r["seq_id"]: r["insecurity"]
        for r in insecurity_index(
            _df(spark, seqs), bound=True, state_order=order
        ).collect()
    }
    costs = state_precarity_costs(order)
    for i, seq in enumerate(seqs):
        lo = min(costs[s] for s in _dss(seq))
        hi = max(costs[s] for s in _dss(seq))
        assert lo <= got[f"s{i:02d}"] <= hi, i


def test_equal_costs_act_as_equivalence_class(spark):
    """User costs with ties: transitions inside the tie contribute 0
    (the reference's state_equiv semantics for RANK)."""
    seqs = [["A", "B", "A", "C"]]
    costs = {"A": 0.0, "B": 0.0, "C": 1.0}
    got = degradation_index(
        _df(spark, seqs), costs=costs, state_order=["A", "B", "C"]
    ).collect()[0]["degradation"]
    # A<->B moves cost 0 (tied costs); only A->C at spell 4 contributes:
    # tr = 1, sign = +1, integ = 4/(1+2+3+4)
    assert got == pytest.approx(4 / 10)


def test_positive_negative_indicators(spark):
    """seqipos mirror: share over DSS spells, integr over binary turns,
    volatility over binary turns."""
    from sequenzo_spark.operators.indicators import positive_negative_indicator

    seqs = _toy(seed=13, n=12, tmax=7)
    pos, neg = ["A"], ["B", "C"]
    df = _df(spark, seqs)

    share = {r["seq_id"]: r["share"]
             for r in positive_negative_indicator(df, pos, neg).collect()}
    integ = {r["seq_id"]: r["integr"]
             for r in positive_negative_indicator(
                 df, pos, neg, index="integr", power=1.0).collect()}
    vol = {r["seq_id"]: r["volatility"]
           for r in positive_negative_indicator(
               df, pos, neg, index="volatility").collect()}
    for i, seq in enumerate(seqs):
        d = _dss(seq)
        want_share = sum(1 for s in d if s in pos) / len(d)
        assert share[f"s{i:02d}"] == pytest.approx(want_share), i
        b = ["p" if s in pos else "n" for s in seq]
        den = sum(t + 1 for t in range(len(b)))
        want_integ = sum(t + 1 for t, s in enumerate(b) if s == "p") / den
        assert integ[f"s{i:02d}"] == pytest.approx(want_integ), i
        visited = len(set(b))
        trans = sum(1 for t in range(1, len(b)) if b[t] != b[t - 1])
        tn = 0.0 if len(b) <= 1 else trans / (len(b) - 1)
        want_vol = 0.5 * (visited - 1) / 1 + 0.5 * tn
        assert vol[f"s{i:02d}"] == pytest.approx(want_vol), i


def test_positive_negative_complement_and_validation(spark):
    from sequenzo_spark.operators.indicators import positive_negative_indicator

    df = _df(spark, [["A", "B", "C"]])
    # neg implied as complement of pos
    r = positive_negative_indicator(df, pos_states=["A"], dss=False).collect()
    assert r[0]["share"] == pytest.approx(1 / 3)
    with pytest.raises(ValueError):
        positive_negative_indicator(df, ["A"], ["A", "B"]).collect()


def _ref_turnlevel_weights(seqs, order, method, border_effect=10.0):
    """FREQ (global proportions) / TRATE (row rates) over TURN-level lag-1
    transitions (self-transitions included in the totals), then the same
    border/ADD/normalize steps."""
    k = len(order)
    idx = {s: i for i, s in enumerate(order)}
    cnt = np.zeros((k, k))
    for seq in seqs:
        for a, b in zip(seq, seq[1:]):
            cnt[idx[a], idx[b]] += 1
    if method == "FREQ":
        tr = cnt / cnt.sum()
    else:
        rows = cnt.sum(axis=1, keepdims=True)
        with np.errstate(invalid="ignore", divide="ignore"):
            tr = np.where(rows > 0, cnt / rows, 0.0)
    np.fill_diagonal(tr, 0.0)
    if np.any(tr > 1 - 0.1 / border_effect):
        tr = tr - tr / border_effect
    tr = 1 - tr
    pos = tr[tr > 0]
    if pos.size:
        tr = tr / pos.max()
    np.fill_diagonal(tr, 0.0)
    return {(a, b): tr[idx[a], idx[b]] for a in order for b in order}


@pytest.mark.parametrize("method", ["FREQ", "TRATE"])
def test_degradation_turnlevel_methods(spark, method):
    seqs = _toy(seed=19)
    order = sorted({s for q in seqs for s in q})
    costs = state_precarity_costs(order)
    wmap = _ref_turnlevel_weights(seqs, order, method)
    got = {
        r["seq_id"]: r["degradation"]
        for r in degradation_index(
            _df(spark, seqs), method=method, spell_integr=False
        ).collect()
    }
    for i, seq in enumerate(seqs):
        want = _ref_degradation(seq, costs, spell_integr=False, tr_lookup=wmap)
        assert got[f"s{i:02d}"] == pytest.approx(want), (i, seq)
