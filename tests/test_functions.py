import math

from pyspark.sql import functions as F

from sequenzo_spark.functions import (
    seqasnum,
    seqconc,
    seqdecomp,
    seqrecode,
    seqsep,
    seqshift,
    weighted_fivenum,
    weighted_mean_var,
)


def test_seqconc_skips_nulls(spark):
    df = spark.createDataFrame(
        [(["A", None, "B", "C"],)], "arr array<string>"
    )
    assert df.select(seqconc(F.col("arr")).alias("s")).first().s == "A-B-C"


def test_seqdecomp_pads(spark):
    df = spark.createDataFrame([("A-B",)], "s string")
    got = df.select(seqdecomp(F.col("s"), 4).alias("a")).first().a
    assert got == ["A", "B", None, None]


def test_seqsep(spark):
    df = spark.createDataFrame([("ABC",)], "s string")
    assert df.select(seqsep(F.col("s")).alias("x")).first().x == "A-B-C"
    df2 = spark.createDataFrame([("AABBCC",)], "s string")
    got = df2.select(seqsep(F.col("s"), width=2).alias("x")).first().x
    assert got == "AA-BB-CC"


def test_seqshift_na_padding(toy):
    shifted = toy.select(
        "seq_id", "pos", seqshift("state", 1).alias("prev")
    ).orderBy("seq_id", "pos")
    rows = [r.prev for r in shifted.collect() if r.seq_id == "s1"]
    assert rows == [None, "A", "A", "B"]


def test_seqrecode_with_otherwise(spark):
    df = spark.createDataFrame([("A",), ("B",), ("Z",)], "s string")
    out = [
        r.x
        for r in df.select(
            seqrecode(F.col("s"), {"A": "hi", "B": "lo"}, otherwise="other")
            .alias("x")
        ).collect()
    ]
    assert out == ["hi", "lo", "other"]
    kept = [
        r.x
        for r in df.select(
            seqrecode(F.col("s"), {"A": "hi"}).alias("x")
        ).collect()
    ]
    assert kept == ["hi", "B", "Z"]


def test_seqasnum(spark):
    df = spark.createDataFrame([("B",), ("A",), ("X",)], "s string")
    out = [
        r.x
        for r in df.select(seqasnum(F.col("s"), ["A", "B"]).alias("x")).collect()
    ]
    assert out == [1, 0, None]


def test_weighted_mean_var(spark):
    # hand case: x=[1,2,3], w=[1,1,2] → mean=9/4; unbiased var =
    # Σw(x−m)²/(Σw−1) = (1.5625 + 0.0625 + 1.125)/3 = 2.75/3
    df = spark.createDataFrame(
        [("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 2.0)],
        "g string, x double, w double",
    )
    r = weighted_mean_var(df, "x", "w", ["g"]).first()
    assert r.mean == 2.25
    assert abs(r.variance - 2.75 / 3) < 1e-12
    assert r.weight_sum == 4.0


def test_weighted_fivenum(spark):
    df = spark.createDataFrame(
        [("g", float(v), 1.0) for v in range(1, 101)],
        "g string, x double, w double",
    )
    r = weighted_fivenum(df, "x", "w", ["g"]).first()
    assert r.minimum == 1.0 and r.maximum == 100.0
    assert abs(r.median - 50.5) < 1e-9
    assert 25.0 <= r.q1 <= 26.0 and 75.0 <= r.q3 <= 76.0
