"""EMLT (seqemlt) vs an independent dense-NumPy mirror of the published
TraMineRextras algorithm (freq → transrate → discounted profiles →
distances → Benzécri → princomp(cor=TRUE) → coordinates)."""

import random

import numpy as np
import pytest

from sequenzo_spark.operators.emlt import (
    emlt,
    situation_cooccurrence,
    situation_frequencies,
)


def _df(spark, seqs, weights=None):
    rows = []
    for i, seq in enumerate(seqs):
        for p, st in enumerate(seq):
            r = (f"s{i:02d}", p + 1, st)
            if weights is not None:
                r = r + (float(weights[i]),)
            rows.append(r)
    schema = "seq_id string, pos int, state string" + (
        ", w double" if weights is not None else ""
    )
    return spark.createDataFrame(rows, schema)


def _mirror(seqs, a=1.0, b=1.0, weights=None):
    """Dense rectangular mirror: disjunctive matrix over sorted states ×
    periods, then the reference pipeline restricted to observed
    situations (matching the engine's active-only set)."""
    N, T = len(seqs), len(seqs[0])
    states = sorted({s for seq in seqs for s in seq})
    w = np.ones(N) if weights is None else np.asarray(weights, float)
    situations = [(s, t) for t in range(1, T + 1) for s in states]
    disj = np.zeros((N, len(situations)))
    for i, seq in enumerate(seqs):
        for t in range(T):
            disj[i, situations.index((seq[t], t + 1))] = 1.0
    freq = (w[:, None] * disj).sum(axis=0)
    active = freq > 0
    sit = [st for st, keep in zip(situations, active) if keep]
    dw = w[:, None] * disj[:, active]
    S = len(sit)
    sit_t = np.array([t for (_s, t) in sit])
    rates = np.zeros((S, S))
    for i in range(S):
        nb = dw[:, i].sum()
        for j in range(S):
            if sit_t[j] >= sit_t[i]:
                rates[i, j] = dw[:, i] @ dw[:, j] / nb
    prof = np.zeros((S, S))
    for i in range(S):
        for j in range(S):
            if sit_t[j] >= sit_t[i]:
                prof[i, j] = rates[i, j] / (a * (sit_t[j] - sit_t[i]) + b)
        prof[i] /= prof[i].sum()
    cs = prof.sum(axis=0)
    d = np.zeros((S, S))
    for i in range(S):
        for j in range(S):
            dp = prof[i] - prof[j]
            d[i, j] = (dp / cs) @ dp
    rm = d.mean(axis=1, keepdims=True)
    cm = d.mean(axis=0, keepdims=True)
    benz = -0.5 * (d - rm - cm + rm.mean())
    # princomp(cor=TRUE)
    c = benz - benz.mean(axis=0)
    cov = (c.T @ c) / S
    sd = np.sqrt(np.diag(cov))
    corr = cov / np.outer(sd, sd)
    vals, vecs = np.linalg.eigh(corr)
    o = np.argsort(vals)[::-1]
    vals, vecs = vals[o], vecs[:, o]
    vecs[:, vecs[0] < 0] *= -1
    scores = ((benz - benz.mean(axis=0)) / sd) @ vecs
    coord = disj[:, active] @ scores
    return dict(sit=sit, freq=freq[active], rates=rates, prof=prof, d=d,
                benz=benz, scores=scores, coord=coord)


def test_frequencies_and_cooccurrence(spark):
    seqs = [["A", "B"], ["A", "A"], ["B", "B"]]
    f = {(r["s"], r["t"]): r["freq"]
         for r in situation_frequencies(_df(spark, seqs)).collect()}
    assert f == {("A", 1): 2.0, ("B", 1): 1.0, ("A", 2): 1.0, ("B", 2): 2.0}
    co = {
        (r["si"], r["ti"], r["sj"], r["tj"]): (r["cooc"], r["rate"])
        for r in situation_cooccurrence(_df(spark, seqs)).collect()
    }
    # diagonal rate is 1; (A,1)->(B,2) co-occurs once (s0) of nb=2
    assert co[("A", 1, "A", 1)] == (2.0, 1.0)
    assert co[("A", 1, "B", 2)] == (1.0, 0.5)
    assert ("B", 2, "A", 1) not in co  # tj >= ti only


@pytest.mark.parametrize("weighted", [False, True])
def test_emlt_matches_mirror(spark, weighted):
    rng = random.Random(21)
    T, N = 4, 12
    seqs = [[rng.choice("AB") for _ in range(T)] for _ in range(N)]
    weights = [1.0 + 0.5 * (i % 3) for i in range(N)] if weighted else None
    df = _df(spark, seqs, weights)
    got = emlt(df, weight_col="w" if weighted else None)
    want = _mirror(seqs, weights=weights)
    assert got["situations"] == want["sit"]
    np.testing.assert_allclose(got["freq"], want["freq"])
    np.testing.assert_allclose(got["transrate"], want["rates"], atol=1e-12)
    np.testing.assert_allclose(got["profiles"], want["prof"], atol=1e-12)
    np.testing.assert_allclose(got["distances"], want["d"], atol=1e-12)
    np.testing.assert_allclose(got["benz"], want["benz"], atol=1e-12)
    np.testing.assert_allclose(
        got["pca"]["scores"], want["scores"], atol=1e-8
    )
    coord = {
        (r["seq_id"], r["axis"]): r["coord"]
        for r in got["coord"].collect()
    }
    for i in range(N):
        for ax in range(want["coord"].shape[1]):
            assert coord[(f"s{i:02d}", ax + 1)] == pytest.approx(
                want["coord"][i, ax], abs=1e-8
            ), (i, ax)


def test_emlt_discount_parameters(spark):
    """a/b change the time discount: with a=0, b=2 every lag is divided by
    the same constant, so profiles equal the a=1,b=1... check against the
    mirror rather than a constant-cancellation claim."""
    seqs = [["A", "B", "A"], ["B", "B", "A"], ["A", "A", "B"]]
    got = emlt(_df(spark, seqs), a=0.5, b=2.0)
    want = _mirror(seqs, a=0.5, b=2.0)
    np.testing.assert_allclose(got["profiles"], want["prof"], atol=1e-12)
