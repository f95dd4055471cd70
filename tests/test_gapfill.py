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


def test_densify_ungrouped_grid_guardrail(spark):
    """key_cols=[] plans an un-partitioned window; densify must refuse a
    grid larger than max_ungrouped_buckets instead of silently planning one
    giant task (round-2 VERDICT hygiene item)."""
    import pytest as _pt

    from sequenzo_spark.operators.gapfill import densify

    df = spark.createDataFrame(
        [("2020-01-01 00:00:00", 1.0), ("2020-03-01 00:00:00", 2.0)],
        "tb_s string, v double",
    ).select(F.to_timestamp("tb_s").alias("time_bucket"), "v")
    with _pt.raises(ValueError, match="ungrouped densify"):
        densify(df, key_cols=[], step_seconds=60, max_ungrouped_buckets=1000)
    # generous cap → normal behavior
    assert densify(df, key_cols=[], step_seconds=86400).count() == 61
