from pyspark.sql import functions as F

from sequenzo_spark.operators.gapfill import densify, fill_gaps


def _series(spark):
    # minutes 0,1,4,5 present; 2,3 missing
    rows = [
        ("k", "2024-01-01 00:00:00", 10.0),
        ("k", "2024-01-01 00:01:00", 20.0),
        ("k", "2024-01-01 00:04:00", 50.0),
        ("k", "2024-01-01 00:05:00", 60.0),
    ]
    return spark.createDataFrame(rows, "k string, tb string, v double").select(
        "k", F.to_timestamp("tb").alias("time_bucket"), "v"
    )


def test_densify_marks_gaps(spark):
    d = densify(_series(spark), ["k"], step_seconds=60).orderBy("time_bucket")
    rows = d.collect()
    assert len(rows) == 6
    assert [r.is_gap for r in rows] == [False, False, True, True, False, False]


def test_locf(spark):
    f = fill_gaps(_series(spark), ["k"], ["v"], method="locf").orderBy(
        "time_bucket"
    )
    assert [r.v for r in f.collect()] == [10.0, 20.0, 20.0, 20.0, 50.0, 60.0]


def test_linear_interpolation(spark):
    f = fill_gaps(_series(spark), ["k"], ["v"], method="linear").orderBy(
        "time_bucket"
    )
    # holes at minutes 2,3 between anchors (1,20) and (4,50): 30, 40
    assert [r.v for r in f.collect()] == [10.0, 20.0, 30.0, 40.0, 50.0, 60.0]


def test_linear_leading_trailing_fallback(spark):
    rows = [("k", "2024-01-01 00:01:00", None), ("k", "2024-01-01 00:02:00", 5.0),
            ("k", "2024-01-01 00:03:00", None)]
    df = spark.createDataFrame(rows, "k string, tb string, v double").select(
        "k", F.to_timestamp("tb").alias("time_bucket"), "v"
    )
    # drop the NULL rows (absent buckets), then fill over the 1..3 span
    present = df.filter(F.col("v").isNotNull())
    f = fill_gaps(present, ["k"], ["v"], method="linear").orderBy("time_bucket")
    assert [r.v for r in f.collect()] == [5.0]  # single point, no holes
