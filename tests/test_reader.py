import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def hive_dir(spark):
    from rehiver_spark.flagship import partitioned_events_dir

    return partitioned_events_dir(spark, "/root/testdata/sf0.001")


def test_read_matching_scopes_files(spark, hive_dir):
    from rehiver_spark.sources.reader import read_matching

    df = read_matching(spark, hive_dir, "year=2024/month=1/day=5/**")
    assert df.count() > 0
    assert {r["day"] for r in df.select("day").distinct().collect()} == {5}
    # partition columns survive via basePath
    assert {"year", "month", "day", "hour"} <= set(df.columns)
    total = spark.read.parquet(hive_dir).count()
    assert df.count() < total


def test_read_matching_negation(spark, hive_dir):
    from rehiver_spark.sources.reader import read_matching

    df = read_matching(
        spark, hive_dir, ["year=2024/month=1/day=?/**", "!**/day=3/**"]
    )
    days = {r["day"] for r in df.select("day").distinct().collect()}
    assert 3 not in days and days <= set(range(1, 10)) and days


def test_read_matching_no_match_raises(spark, hive_dir):
    from rehiver_spark.sources.reader import read_matching

    with pytest.raises(FileNotFoundError):
        read_matching(spark, hive_dir, "year=1999/**")


def test_events_ts_data_contract(spark):
    """Pin the ts unit handling: the testdata is timestamp[us] and all
    events live in 2024. A unit mix-up (the round-2 nanos bug) lands
    everything in 1970 — this test is the tripwire."""
    from rehiver_spark.session import read_events

    ev = read_events(spark, "/root/testdata/sf0.001")
    row = ev.agg(
        F.min(F.year("ts")).alias("ymin"), F.max(F.year("ts")).alias("ymax")
    ).first()
    assert row["ymin"] == 2024 and row["ymax"] == 2024


def test_read_path_glob(spark, hive_dir):
    from rehiver_spark.sources.reader import read_path_glob

    df = read_path_glob(spark, hive_dir + "/year=2024/month=1/day=5", "*.parquet")
    assert df.count() > 0
