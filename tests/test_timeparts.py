"""TimePartitioner tests — mirror reference tests/index.test.ts:1048-1304."""

from datetime import datetime

from rehiver_spark.operators.timeparts import TimePartitioner


def test_daily_hive():
    tp = TimePartitioner("daily")
    assert tp.path_for(datetime(2023, 1, 1)) == "year=2023/month=01/day=01"


def test_daily_plain_prefix():
    tp = TimePartitioner("daily", fmt="path", prefix="data")
    assert tp.path_for(datetime(2023, 2, 5)) == "data/2023/02/05"


def test_hourly_implies_hour():
    tp = TimePartitioner("hourly")
    assert tp.include_hour
    assert tp.path_for(datetime(2023, 1, 1, 7)) == "year=2023/month=01/day=01/hour=07"


def test_minute_implies_hour():
    tp = TimePartitioner("daily", include_minute=True)
    assert tp.include_hour
    assert (
        tp.path_for(datetime(2023, 1, 1, 7, 30))
        == "year=2023/month=01/day=01/hour=07/minute=30"
    )


def test_monthly_yearly():
    assert TimePartitioner("monthly").path_for(datetime(2023, 12, 25)) == "year=2023/month=12"
    assert TimePartitioner("yearly").path_for(datetime(2023, 12, 25)) == "year=2023"


def test_range_daily():
    tp = TimePartitioner("daily")
    got = tp.range_paths(datetime(2023, 1, 30), datetime(2023, 2, 2))
    assert got == [
        "year=2023/month=01/day=30",
        "year=2023/month=01/day=31",
        "year=2023/month=02/day=01",
        "year=2023/month=02/day=02",
    ]


def test_range_single_day():
    tp = TimePartitioner("daily")
    got = tp.range_paths(datetime(2023, 5, 5, 3), datetime(2023, 5, 5, 22))
    assert got == ["year=2023/month=05/day=05"]


def test_range_monthly_calendar_aware():
    tp = TimePartitioner("monthly")
    got = tp.range_paths(datetime(2023, 11, 15), datetime(2024, 2, 1))
    assert got == [
        "year=2023/month=11",
        "year=2023/month=12",
        "year=2024/month=01",
        "year=2024/month=02",
    ]


def test_range_hourly():
    tp = TimePartitioner("hourly")
    got = tp.range_paths(datetime(2023, 1, 1, 22, 30), datetime(2023, 1, 2, 1))
    assert got == [
        "year=2023/month=01/day=01/hour=22",
        "year=2023/month=01/day=01/hour=23",
        "year=2023/month=01/day=02/hour=00",
        "year=2023/month=01/day=02/hour=01",
    ]


def test_path_col(spark):
    tp = TimePartitioner("hourly", prefix="events")
    df = spark.createDataFrame([(datetime(2024, 1, 15, 9, 5),)], ["ts"])
    got = df.select(tp.path_col("ts").alias("p")).first()["p"]
    assert got == "events/year=2024/month=01/day=15/hour=09"


def test_paths_df_matches_driver(spark):
    tp = TimePartitioner("daily")
    start, end = datetime(2023, 1, 30), datetime(2023, 2, 2)
    dist = [r["path"] for r in tp.paths_df(spark, start, end).orderBy("ts").collect()]
    assert dist == tp.range_paths(start, end)


def test_range_filter_prunes(spark, tmp_path):
    # write events hive-partitioned, read with range filter, verify rows
    from pyspark.sql import functions as F

    from rehiver_spark.operators.timeparts import TimePartitioner
    from rehiver_spark.session import read_events

    ev = read_events(spark, "/root/testdata/sf0.001")
    out = str(tmp_path / "ev")
    (
        ev.withColumn("year", F.year("ts"))
        .withColumn("month", F.month("ts"))
        .withColumn("day", F.dayofmonth("ts"))
        .write.partitionBy("year", "month", "day")
        .parquet(out)
    )
    tp = TimePartitioner("daily")
    start, end = datetime(2024, 1, 3), datetime(2024, 1, 5)
    got = spark.read.parquet(out).filter(tp.range_filter(start, end)).count()
    want = ev.filter((F.to_date("ts") >= "2024-01-03") & (F.to_date("ts") <= "2024-01-05")).count()
    assert got == want and got > 0
    # the filter must actually prune partitions in the plan
    plan = (
        spark.read.parquet(out)
        .filter(tp.range_filter(start, end))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [" in plan


def test_path_col_non_utc_parity(spark):
    # round-1 audit fix: Column path must agree with driver path_for
    # for non-UTC timezones (was to_utc_timestamp — inverted direction)
    from datetime import datetime, timezone

    from rehiver_spark.operators.timeparts import TimePartitioner

    for tz in ("America/New_York", "Asia/Tokyo"):
        tp = TimePartitioner(granularity="hourly", timezone=tz)
        dts = [
            datetime(2024, 1, 15, 2, 0, tzinfo=timezone.utc),
            datetime(2024, 7, 1, 23, 30, tzinfo=timezone.utc),  # DST side
        ]
        expected = [tp.path_for(d) for d in dts]
        df = spark.createDataFrame(
            [(d.replace(tzinfo=None),) for d in dts], "ts timestamp"
        )
        got = [r[0] for r in df.select(tp.path_col("ts")).collect()]
        assert got == expected, tz


def test_paths_df_agrees_with_range_paths_non_utc(spark):
    """A NAIVE endpoint means target-timezone wall time in BOTH the
    driver and the distributed API — paths_df used to read it as a UTC
    instant and emit every path one tz-offset off range_paths."""
    from datetime import datetime, timezone

    from rehiver_spark.operators.timeparts import TimePartitioner

    tp = TimePartitioner("hourly", timezone="America/New_York")
    start, end = datetime(2024, 1, 1, 0), datetime(2024, 1, 1, 2)
    want = tp.range_paths(start, end)
    got = [r["path"] for r in tp.paths_df(spark, start, end).orderBy("ts").collect()]
    assert got == want
    assert want[0].endswith("hour=00")  # wall time, not shifted to 2023-12-31/19

    # aware endpoints convert — both APIs agree there too
    aware = datetime(2024, 1, 1, 5, tzinfo=timezone.utc)  # = midnight NY
    aware_end = datetime(2024, 1, 1, 7, tzinfo=timezone.utc)
    assert [
        r["path"] for r in tp.paths_df(spark, aware, aware_end).orderBy("ts").collect()
    ] == tp.range_paths(aware, aware_end)
