"""Prefix-tree indicators vs a pure-Python mirror of the reference
(prefix_tree/system_level_indicators.py PrefixTree + compute_prefix_count /
compute_branching_factor; individual_level_indicators.py
IndividualDivergence rarity / path uniqueness)."""

import math
import random
from collections import defaultdict

import pytest

from sequenzo_spark.operators.prefix_tree import prefix_rarity, prefix_tree_stats


def _df(spark, seqs, group=None):
    rows = []
    for i, seq in enumerate(seqs):
        g = group[i] if group else None
        for p, st in enumerate(seq):
            rows.append(
                (f"s{i}", p, st) if group is None else (f"s{i}", p, st, g)
            )
    schema = "seq_id string, pos int, state string" + (
        ", grp string" if group else ""
    )
    return spark.createDataFrame(rows, schema)


def _ref_prefix_sets(seqs):
    """depth -> set of distinct prefixes (reference tree.counts keys by
    depth) and depth -> Counter of prefix frequency (one insert per seq,
    as IndividualDivergence._build_prefix_frequencies does)."""
    by_depth = defaultdict(set)
    freq = defaultdict(lambda: defaultdict(int))
    for seq in seqs:
        for t in range(1, len(seq) + 1):
            key = tuple(seq[:t])
            by_depth[t].add(key)
            freq[t][key] += 1
    return by_depth, freq


def test_stats_match_reference_tree(spark):
    rng = random.Random(11)
    seqs = [
        [rng.choice("AB C".split() + ["A"]) for _ in range(rng.randint(1, 9))]
        for _ in range(30)
    ]
    by_depth, _ = _ref_prefix_sets(seqs)
    got = {r["t"]: r for r in prefix_tree_stats(_df(spark, seqs)).collect()}
    max_d = max(by_depth)
    assert set(got) == set(range(1, max_d + 1))
    for t in range(1, max_d + 1):
        assert got[t]["n_prefixes"] == len(by_depth[t]), t
        if t == 1:
            assert got[t]["branching_factor"] == 0.0
        else:
            # mean children over depth-(t-1) prefixes == count ratio
            want = len(by_depth[t]) / len(by_depth[t - 1])
            assert got[t]["branching_factor"] == pytest.approx(want), t


def test_branching_factor_equals_mean_children(spark):
    """The closed form must equal the reference's explicit mean-children
    definition, computed here via an actual trie."""
    seqs = [["A", "B"], ["A", "C"], ["B", "B"], ["A", "B", "C"]]
    root = {}
    for seq in seqs:
        node = root
        for st in seq:
            node = node.setdefault(st, {})

    def prefixes_at(node, d, depth=0):
        if depth == d:
            return [node]
        out = []
        for child in node.values():
            out.extend(prefixes_at(child, d, depth + 1))
        return out

    got = {r["t"]: r["branching_factor"]
           for r in prefix_tree_stats(_df(spark, seqs)).collect()}
    for t in (2, 3):
        parents = prefixes_at(root, t - 1)
        # reference averages over REACHED depth-(t-1) nodes incl. leaves
        parents = [p for p in parents]
        want = sum(len(p) for p in parents) / len(parents)
        # leaves at depth t-1 (sequences ending there) have 0 children in
        # the trie but are still counted by the reference mean — and by the
        # count ratio ONLY if no sequence ends at t-1. Use non-ending toy
        # depths to keep the definitions aligned.
        if all(len(s) != t - 1 for s in seqs):
            assert got[t] == pytest.approx(want), t


def test_rarity_matches_reference_formula(spark):
    seqs = [["A", "B", "A"], ["A", "B", "B"], ["B", "A", "A"], ["A", "B", "A"]]
    _, freq = _ref_prefix_sets(seqs)
    N = len(seqs)
    got = {r["seq_id"]: r for r in prefix_rarity(_df(spark, seqs)).collect()}
    for i, seq in enumerate(seqs):
        want_score = sum(
            -math.log(freq[t][tuple(seq[:t])] / N + 1e-10)
            for t in range(1, len(seq) + 1)
        )
        want_uniq = sum(
            1 for t in range(1, len(seq) + 1) if freq[t][tuple(seq[:t])] == 1
        )
        r = got[f"s{i}"]
        assert r["rarity_score"] == pytest.approx(want_score), i
        assert r["path_uniqueness"] == want_uniq, i
    # identical sequences share identical scores
    assert got["s0"]["rarity_score"] == got["s3"]["rarity_score"]


def test_rarity_grouped(spark):
    """Within-group variant: freq and N computed per group
    (compute_path_uniqueness_by_group_prefix)."""
    seqs = [["A", "B"], ["A", "C"], ["A", "B"], ["B", "B"]]
    groups = ["g0", "g0", "g1", "g1"]
    got = {
        r["seq_id"]: r
        for r in prefix_rarity(
            _df(spark, seqs, groups), group_col="grp"
        ).collect()
    }
    # g0 = {s0:[A,B], s1:[A,C]}: prefix (A) shared (freq 2), depth-2 unique
    for sid in ("s0", "s1"):
        assert got[sid]["path_uniqueness"] == 1
        assert got[sid]["rarity_score"] == pytest.approx(
            -math.log(2 / 2 + 1e-10) - math.log(1 / 2 + 1e-10)
        )
    # g1 = {s2:[A,B], s3:[B,B]}: fully unique paths
    for sid in ("s2", "s3"):
        assert got[sid]["path_uniqueness"] == 2
        assert got[sid]["rarity_score"] == pytest.approx(
            -2 * math.log(1 / 2 + 1e-10)
        )


def test_variable_lengths_and_zero_normalization(spark):
    # single sequence: every prefix has freq == N == 1 → per-term
    # -ln(1 + 1e-10) ≈ -1e-10 (the reference's epsilon makes the
    # all-shared score a hair below zero, not exactly 0)
    got = prefix_rarity(_df(spark, [["A", "B", "C"]])).collect()[0]
    assert got["rarity_score"] == pytest.approx(
        3 * -math.log(1 + 1e-10), abs=1e-15
    )
    assert got["path_uniqueness"] == 3


def test_prefix_divergence_matches_reference_zscore(spark):
    """prefix_divergence vs a pure-Python mirror of the reference's
    compute_diverged / compute_standardized_rarity_score /
    compute_first_divergence_year (z-score method, ddof=1, NaN-window
    skipping, epsilon 1e-10)."""
    import random

    from sequenzo_spark.operators.prefix_tree import prefix_divergence

    rng = random.Random(123)
    T, N = 6, 20
    seqs = [[rng.choice("AB") for _ in range(T)] for _ in range(N)]
    _, freq = _ref_prefix_sets(seqs)

    # reference mirror
    rarity = [
        [-math.log(freq[t + 1][tuple(seq[: t + 1])] / N + 1e-10)
         for t in range(T)]
        for seq in seqs
    ]
    z = [[None] * T for _ in range(N)]
    for t in range(T):
        col = [rarity[i][t] for i in range(N)]
        mean = sum(col) / N
        var = sum((x - mean) ** 2 for x in col) / (N - 1)
        if len(set(col)) == 1 or var == 0:
            continue
        sd = math.sqrt(var)
        for i in range(N):
            z[i][t] = (rarity[i][t] - mean) / sd

    min_t, window, thr = 2, 2, 1.0
    want = {}
    for i in range(N):
        cands = []
        for p in range(min_t, T - window + 2):  # 1-indexed starts
            vals = [z[i][p - 1 + k] for k in range(window)]
            if any(v is None for v in vals):
                continue
            cands.append((p, min(vals)))
        score = max((wm for _p, wm in cands), default=None)
        passed = [p for p, wm in cands if wm > thr]
        want[f"s{i}"] = (
            score,
            1 if passed else 0,
            min(passed) if passed else 0,
        )

    got = {
        r["seq_id"]: (r["std_score"], r["diverged"], r["first_divergence_t"])
        for r in prefix_divergence(
            _df(spark, seqs), z_threshold=thr, min_t=min_t, window=window
        ).collect()
    }
    assert set(got) == set(want)
    for k in want:
        ws, wd, wf = want[k]
        gs, gd, gf = got[k]
        if ws is None:
            assert gs is None, k
        else:
            assert gs == pytest.approx(ws), k
        assert (gd, gf) == (wd, wf), k


def test_prefix_divergence_short_sequences_and_zero_variance(spark):
    from sequenzo_spark.operators.prefix_tree import prefix_divergence

    # all sequences identical → every depth zero-variance → no valid window
    seqs = [["A", "B", "C"]] * 4
    got = prefix_divergence(_df(spark, seqs), min_t=2, window=1).collect()
    for r in got:
        assert r["std_score"] is None
        assert r["diverged"] == 0 and r["first_divergence_t"] == 0
    # a sequence shorter than min_t+window-1 yields no start positions
    seqs2 = [["A"], ["B", "A", "B"], ["B", "B", "A"]]
    got2 = {
        r["seq_id"]: r
        for r in prefix_divergence(
            _df(spark, seqs2), min_t=2, window=2
        ).collect()
    }
    assert got2["s0"]["std_score"] is None and got2["s0"]["diverged"] == 0


def test_hashed_keys_equal_string_keys(spark):
    """The constant-width xxhash64 chain key must reproduce every output
    of the string-key path (keys only feed equality grouping)."""
    import random

    from sequenzo_spark.operators.prefix_tree import prefix_divergence
    from sequenzo_spark.operators.suffix_tree import suffix_rarity

    rng = random.Random(7)
    seqs = [
        [rng.choice("ABC") for _ in range(rng.randint(1, 8))]
        for _ in range(25)
    ]
    df = _df(spark, seqs)

    a = sorted(map(tuple, prefix_tree_stats(df).collect()))
    b = sorted(map(tuple, prefix_tree_stats(df, hashed=True).collect()))
    assert a == b

    a = sorted(map(tuple, prefix_rarity(df).collect()))
    b = sorted(map(tuple, prefix_rarity(df, hashed=True).collect()))
    assert a == b

    a = sorted(map(tuple, prefix_divergence(df, min_t=1).collect()))
    b = sorted(map(tuple, prefix_divergence(df, min_t=1, hashed=True).collect()))
    # the two plans sum the per-depth moments in different orders — the
    # z's (and std_score) agree only to last-ulp; flags/years are exact
    for ra, rb in zip(a, b):
        assert ra[0] == rb[0] and ra[2:] == rb[2:], (ra, rb)
        assert ra[1] == pytest.approx(rb[1], rel=1e-9), (ra, rb)

    a = sorted(map(tuple, suffix_rarity(df).collect()))
    b = sorted(map(tuple, suffix_rarity(df, hashed=True).collect()))
    assert a == b


def test_hashed_keys_are_fixed_width(spark):
    """The hashed path's shuffle key must be an 8-byte long, not the
    O(depth) string (the scale rationale for hashed=True)."""
    from pyspark.sql.types import LongType, StringType

    from sequenzo_spark.operators.prefix_tree import _prefix_rows

    df = _df(spark, [["A", "B", "C"]])
    assert isinstance(
        _prefix_rows(df).schema["prefix"].dataType, StringType
    )
    assert isinstance(
        _prefix_rows(df, hashed=True).schema["prefix"].dataType, LongType
    )
    # the (t, prefix) aggregation's exchange therefore carries fixed-width
    # keys; assert the plan aggregates on the bigint column end-to-end
    plan = (
        _prefix_rows(df, hashed=True)
        .groupBy("t", "prefix")
        .count()
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "prefix#" in plan and "HashAggregate" in plan
