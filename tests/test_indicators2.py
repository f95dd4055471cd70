"""Round-2 indicator operators vs hand-computed reference values.

Fixture seqs: s1 = A-A-B-B (DSS [A,B], dur [2,2]), s2 = A-B-B-A
(DSS [A,B,A], dur [1,2,1]), s3 = A-A-A-A (DSS [A], dur [4]).
All expectations derived by hand from the reference formulas
(cross_sectional_indicators.py, entropy_difference.py,
variance_of_spell_durations.py, turbulence.py, integration_index.py).
"""

import math

import pytest

from sequenzo_spark.operators.distributions import (
    cross_sectional_distribution,
    js_divergence_consecutive,
)
from sequenzo_spark.operators.indicators import (
    entropy_difference,
    integration_index,
    mean_time_in_states,
    spell_duration_variance,
    stat_summary,
    turbulence,
)


@pytest.fixture(scope="module")
def toy3(spark):
    rows = [
        ("s1", 0, "A"), ("s1", 1, "A"), ("s1", 2, "B"), ("s1", 3, "B"),
        ("s2", 0, "A"), ("s2", 1, "B"), ("s2", 2, "B"), ("s2", 3, "A"),
        ("s3", 0, "A"), ("s3", 1, "A"), ("s3", 2, "A"), ("s3", 3, "A"),
    ]
    return spark.createDataFrame(rows, "seq_id string, pos int, state string")


def test_mean_time_in_states(toy3):
    # c_A = [2,2,4], c_B = [2,2,0], n = 3
    got = {r["state"]: r for r in mean_time_in_states(toy3, serr=True).collect()}
    assert got["A"]["mean_time"] == pytest.approx(8 / 3)
    assert got["B"]["mean_time"] == pytest.approx(4 / 3)
    # var = Σ(c−m)²/(n−1) = 4/3 for both states
    for s in ("A", "B"):
        assert got[s]["var_time"] == pytest.approx(4 / 3)
        assert got[s]["sd_time"] == pytest.approx(math.sqrt(4 / 3))
        assert got[s]["se_time"] == pytest.approx(math.sqrt(4 / 9))


def test_entropy_difference(toy3):
    got = {r["seq_id"]: r["hdss"] for r in entropy_difference(toy3).collect()}
    # s1: dur [2,2], ent=ln2, entmax=ln4 → 0.5
    assert got["s1"] == pytest.approx(0.5)
    # s2: dur [1,2,1], ent=1.5·ln2, /ln4 → 0.75
    assert got["s2"] == pytest.approx(0.75)
    # s3: single spell → ent 0 → 0
    assert got["s3"] == 0.0


def test_spell_duration_variance_type1(toy3):
    got = {
        r["seq_id"]: r
        for r in spell_duration_variance(toy3, n_states=2, var_type=1).collect()
    }
    assert got["s2"]["meand"] == pytest.approx(4 / 3)
    assert got["s2"]["var_spell_dur"] == pytest.approx(2 / 9)
    assert got["s2"]["var_max"] == pytest.approx(2 / 9)
    assert got["s1"]["var_spell_dur"] == pytest.approx(0.0)
    assert got["s1"]["var_max"] == pytest.approx(1.0)  # (2−1)(1−2)²


def test_spell_duration_variance_type2(toy3):
    got = {
        r["seq_id"]: r
        for r in spell_duration_variance(toy3, n_states=2, var_type=2).collect()
    }
    # s1: visited 2 → nnv 0 → same mean as type1 path; var 0; maxnnv=0,
    # meand_max=2, var_max = ((1)(1−2)² + (4−2+1−2)²)/2 = 1
    assert got["s1"]["meand"] == pytest.approx(2.0)
    assert got["s1"]["var_spell_dur"] == pytest.approx(0.0)
    assert got["s1"]["var_max"] == pytest.approx(1.0)
    # s3: dlgth 1, visited 1, nnv 1 → meand 2, var (4+4)/2=4;
    # maxnnv=1, meand_max=2, var_max = (0 + (4−1+1−2)² + 1·4)/2 = 4
    assert got["s3"]["meand"] == pytest.approx(2.0)
    assert got["s3"]["var_spell_dur"] == pytest.approx(4.0)
    assert got["s3"]["var_max"] == pytest.approx(4.0)


def test_turbulence_norm_type1(spark):
    rows = [
        ("s1", 0, "A"), ("s1", 1, "A"), ("s1", 2, "B"), ("s1", 3, "B"),
        ("s2", 0, "A"), ("s2", 1, "B"), ("s2", 2, "B"), ("s2", 3, "A"),
    ]
    df = spark.createDataFrame(rows, "seq_id string, pos int, state string")
    got = {
        r["seq_id"]: r
        for r in turbulence(df, var_type=1, norm=True, states=["A", "B"]).collect()
    }
    # raw: s1 → log2(4·(1+1)/(0+1)) = 3; s2 → log2 7
    # synthetic ABAB: φ=12, s2=s2max=0 → maxT = log2 12
    max_t = math.log2(12)
    assert got["s1"]["turbulence"] == pytest.approx((3 - 1) / (max_t - 1))
    assert got["s2"]["turbulence"] == pytest.approx(
        (math.log2(7) - 1) / (max_t - 1)
    )


def test_turbulence_type2_runs(toy3):
    got = turbulence(toy3, var_type=2, norm=True, states=["A", "B"]).collect()
    assert len(got) == 3
    for r in got:
        assert 0.0 <= r["turbulence"] <= 1.0 + 1e-12


def test_integration_index(toy3):
    got = {
        r["seq_id"]: r["integration"]
        for r in integration_index(toy3, target_state="B").collect()
    }
    assert got["s1"] == pytest.approx(0.7)  # (3+4)/10
    assert got["s2"] == pytest.approx(0.5)  # (2+3)/10
    assert got["s3"] == pytest.approx(0.0)


def test_stat_summary(spark):
    df = spark.createDataFrame([(1,), (2,)], "transitions int")
    r = stat_summary(df, "transitions").first()
    assert r["count"] == 2
    assert r["mean"] == pytest.approx(1.5)
    assert r["median"] == pytest.approx(1.5)
    assert r["q1"] == pytest.approx(1.25)
    assert r["q3"] == pytest.approx(1.75)
    assert (r["min"], r["max"]) == (1.0, 2.0)


def test_js_divergence_consecutive(spark):
    rows = [
        (1, "A"), (1, "B"),     # bucket 1: A 0.5, B 0.5
        (2, "A"), (2, "A"),     # bucket 2: A 1.0
    ]
    df = spark.createDataFrame(rows, "time_bucket int, state string")
    dist = cross_sectional_distribution(df, "time_bucket", "state")
    got = {r["time_bucket"]: r["jsd"] for r in js_divergence_consecutive(dist).collect()}
    assert got[1] == 0.0
    div = 0.5 * (0.5 * math.log(0.5 / 0.75) + 0.5 * math.log(0.5 / 0.25)) + 0.5 * (
        1.0 * math.log(1.0 / 0.75)
    )
    assert got[2] == pytest.approx(math.sqrt(div))


def test_state_freq_per_seq(toy3):
    from sequenzo_spark.operators.indicators import state_freq_per_seq

    got = {r["seq_id"]: r for r in state_freq_per_seq(toy3, ["A", "B"]).collect()}
    assert (got["s1"]["A"], got["s1"]["B"]) == (2.0, 2.0)
    assert (got["s3"]["A"], got["s3"]["B"]) == (4.0, 0.0)
    prop = {r["seq_id"]: r for r in state_freq_per_seq(toy3, ["A", "B"], prop=True).collect()}
    assert (prop["s2"]["A"], prop["s2"]["B"]) == (0.5, 0.5)
    assert prop["s3"]["A"] == 1.0


def test_turbulence_norm_k1_single_state_alphabet(spark):
    """k=1, var_type=2: the synthetic max sequence is ONE long spell, not
    length-1 spells; maxT degenerates (≤1) and the norm path must fall back
    to unnormalized values instead of dividing by zero (round-2 advisor)."""
    rows = [("s1", 0, "A"), ("s1", 1, "A"), ("s1", 2, "A")]
    df = spark.createDataFrame(rows, "seq_id string, pos int, state string")
    got = turbulence(df, var_type=2, norm=True, states=["A"]).collect()
    assert len(got) == 1
    assert got[0]["turbulence"] is not None
    assert math.isfinite(got[0]["turbulence"])
    # unnormalized value: DSS [A], φ=2, k=1 ⇒ nnv=0, meand=3, s2=0,
    # maxnnv=0, meand_max=3, s2max=(0·(1−3)² + (3−1+1−3)²)/1 = 0
    # → T = log2(2·(0+1)/(0+1)) = 1
    assert got[0]["turbulence"] == pytest.approx(1.0)


def test_turbulence_norm_maxlength1(spark):
    """All sequences of length 1 → synthetic maxT == 1: (T−1)/(maxT−1) would
    divide by zero; fall back to unnormalized (round-2 advisor)."""
    rows = [("s1", 0, "A"), ("s2", 0, "B")]
    df = spark.createDataFrame(rows, "seq_id string, pos int, state string")
    got = turbulence(df, var_type=1, norm=True, states=["A", "B"]).collect()
    assert len(got) == 2
    for r in got:
        assert r["turbulence"] is not None and math.isfinite(r["turbulence"])
        # single spell, φ=2, s2=s2max=0 → T = log2(2) = 1
        assert r["turbulence"] == pytest.approx(1.0)


def test_turbulence_golden_csv(spark):
    """Exact parity against committed golden values (tests/golden/
    turbulence_golden.csv) — mirrors the reference's R-parity fixture
    pattern (tests/dissimilarity_measures/ref_*.csv). Values derived by
    hand from the published seqST definition: T = log2(φ(DSS) ·
    (s²max+1)/(s²+1)); var_type 2 uses the declared alphabet ('A','B' for
    the 2-state rows, 'A','B','C' is type-1 only here).
    φ: #distinct subsequences incl. empty — AB→4, ABA→7, A→2, ABAB→12,
    ABC→8. Spell stats: e.g. ABBA durs [1,2,1] → s²=s²max=2/9 → T=log2 7."""
    import csv
    import os

    path = os.path.join(os.path.dirname(__file__), "golden", "turbulence_golden.csv")
    with open(path) as f:
        golden = list(csv.DictReader(f))
    by_vt = {}
    for g in golden:
        by_vt.setdefault(int(g["var_type"]), []).append(g)
    for vt, rows_g in by_vt.items():
        data = []
        for i, g in enumerate(rows_g):
            for p, s in enumerate(g["seq"].split("-")):
                data.append((f"g{i}", p + 1, s))
        df = spark.createDataFrame(data, "seq_id string, pos int, state string")
        states = ["A", "B"] if vt == 2 else ["A", "B", "C"]
        got = {
            r.seq_id: r
            for r in turbulence(df, var_type=vt, states=states if vt == 2 else None).collect()
        }
        for i, g in enumerate(rows_g):
            r = got[f"g{i}"]
            assert r["phi"] == pytest.approx(float(g["phi"]), abs=1e-9), (vt, g)
            assert r["turbulence"] == pytest.approx(
                float(g["turbulence"]), abs=1e-9
            ), (vt, g)


def test_js_divergence_year_boundary_stitch(spark):
    """The lag window is partitioned by year; the first bucket of a year must
    still see the PREVIOUS year's last bucket (even across a missing calendar
    year) — identical jsd values to a single global ordering."""
    import datetime as dt

    rows = []
    # 2021-12-31: A,B | 2022-01-01: A,A | 2024-01-01 (2023 missing): B,B
    for ts, states in [
        (dt.datetime(2021, 12, 31), ["A", "B"]),
        (dt.datetime(2022, 1, 1), ["A", "A"]),
        (dt.datetime(2024, 1, 1), ["B", "B"]),
    ]:
        rows += [(ts, s) for s in states]
    df = spark.createDataFrame(rows, "time_bucket timestamp, state string")
    dist = cross_sectional_distribution(df, "time_bucket", "state")
    got = {
        r["time_bucket"]: r["jsd"]
        for r in js_divergence_consecutive(dist).collect()
    }
    assert got[dt.datetime(2021, 12, 31)] == 0.0
    # 2022 bucket vs 2021 bucket: P=(A:1.0), Q=(A:.5,B:.5)
    div = 0.5 * (1.0 * math.log(1.0 / 0.75)) + 0.5 * (
        0.5 * math.log(0.5 / 0.75) + 0.5 * math.log(0.5 / 0.25)
    )
    assert got[dt.datetime(2022, 1, 1)] == pytest.approx(math.sqrt(div))
    # 2024 bucket vs 2022 bucket (2023 absent): P=(B:1.0), Q=(A:1.0) → max JSD
    assert got[dt.datetime(2024, 1, 1)] == pytest.approx(math.sqrt(math.log(2.0)))


def test_turbulence_norm_max_length_validation(spark):
    """An explicit max_length of 0 (or negative) is a caller bug, not
    'unset': it must raise instead of silently normalizing against a
    zero-length synthetic sequence (round-3 advisor)."""
    rows = [("s1", 0, "A"), ("s1", 1, "B")]
    df = spark.createDataFrame(rows, "seq_id string, pos int, state string")
    for bad in (0, -3):
        with pytest.raises(ValueError, match="max_length"):
            turbulence(df, var_type=1, norm=True, states=["A", "B"],
                       max_length=bad)
