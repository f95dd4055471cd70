from sequenzo_spark.catalog import list_datasets, load_dataset


def test_list_and_load(spark):
    names = list_datasets(spark, "/root/testdata/sf0.001")
    assert {"events", "documents", "embeddings", "lineitem"} <= set(names)
    df = load_dataset(spark, "nation", "/root/testdata/sf0.001")
    assert df.count() == 25


def test_load_missing_raises(spark):
    import pytest

    with pytest.raises(FileNotFoundError):
        load_dataset(spark, "nope", "/root/testdata/sf0.001")
