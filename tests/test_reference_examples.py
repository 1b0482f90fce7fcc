"""The reference repo ships three runnable examples (examples/*.ts).
A user switching to this engine should be able to port each one
line-for-line; these tests ARE those ports, asserting the reference's
own printed expectations (parity citations inline)."""

from datetime import datetime, timezone

from pyspark.sql import functions as F


def test_basic_usage_example(spark):
    """examples/basic-usage.ts: glob match / multi-pattern / negation
    over the example's exact path list, plus ContentType detection."""
    from rehiver_spark.engine import Engine
    from rehiver_spark.sources.catalog import content_type_of

    eng = Engine(spark)
    pm = eng.path_matcher()
    paths = [
        "data/year=2023/month=01/day=15/hour=12/events.json",
        "data/year=2023/month=02/day=01/hour=00/events.json",
        "logs/2023/02/01/app.log",
        "reports/monthly/2023-01.csv",
        "reports/quarterly/2023-Q1.xlsx",
    ]
    assert pm.match(paths, "data/**/*.json") == paths[:2]
    assert pm.match(paths, ["reports/**/*.csv", "reports/**/*.xlsx"]) == paths[3:]
    assert pm.not_match(paths, "**/*.log") == paths[:2] + paths[3:]
    # ContentType.detect expectations (src/index.ts:103-155)
    assert content_type_of("document.pdf") == "application/pdf"
    assert content_type_of("image.png") == "image/png"
    assert content_type_of("data.json") == "application/json"
    assert content_type_of("script.js") == "application/javascript"
    assert content_type_of("styles.css") == "text/css"


def test_change_detection_example(spark, tmp_path):
    """examples/change-detection.ts: add → detect(all added) → commit →
    reset → add updated → detect(modified/unchanged/added/deleted)."""
    from rehiver_spark.engine import Engine

    eng = Engine(spark)
    det = eng.change_detector(str(tmp_path / "state"), mode="full")
    initial = [
        ("data/2023/01/file1.csv", 1024, "123456", datetime(2023, 1, 15, 10, tzinfo=timezone.utc)),
        ("data/2023/01/file2.json", 512, "abcdef", datetime(2023, 1, 15, 11, tzinfo=timezone.utc)),
    ]
    schema = "key string, size bigint, etag string, last_modified timestamp"
    det.add_objects(spark.createDataFrame(initial, schema))
    first = {r["key"]: r["change_type"] for r in det.detect().collect()}
    assert first == {k: "added" for k, *_ in initial}
    det.commit()
    det.reset_current()
    updated = [
        ("data/2023/01/file1.csv", 2048, "789012", datetime(2023, 1, 15, 12, tzinfo=timezone.utc)),
        ("data/2023/01/file2.json", 512, "abcdef", datetime(2023, 1, 15, 11, tzinfo=timezone.utc)),
        ("data/2023/01/file3.xml", 768, "fedcba", datetime(2023, 1, 15, 13, tzinfo=timezone.utc)),
    ]
    det.add_objects(spark.createDataFrame(updated, schema))
    second = {r["key"]: r["change_type"] for r in det.detect().collect()}
    assert second == {
        "data/2023/01/file1.csv": "modified",
        "data/2023/01/file2.json": "unchanged",
        "data/2023/01/file3.xml": "added",
    }


def test_partition_handling_example(spark):
    """examples/partition-handling.ts: regex/enum/optional schema,
    parse, safeParse error, createGlobPattern, extractKeys, time
    partitioner daily/hourly paths."""
    from rehiver_spark.engine import Engine
    from rehiver_spark.operators.partitions import PartitionField, PartitionSchema

    eng = Engine(spark)
    sch = PartitionSchema(
        [
            PartitionField("year", "string", pattern=r"\d{4}"),
            PartitionField("month", "string", pattern=r"\d{2}"),
            PartitionField("day", "string", pattern=r"\d{2}"),
            PartitionField("hour", "string", pattern=r"\d{2}", required=False),
            PartitionField("region", "string", values=["us-east", "us-west", "eu-west", "ap-south"]),
            PartitionField("eventType", "string", values=["click", "view", "purchase"]),
        ]
    )
    parser = eng.partition_parser(sch)
    valid = "year=2023/month=01/day=15/hour=12/region=us-east/eventType=click"
    assert parser.parse(valid) == {
        "year": "2023", "month": "01", "day": "15", "hour": "12",
        "region": "us-east", "eventType": "click",
    }
    ok, err = sch.safe_parse("year=2023/month=01/day=15/region=unknown/eventType=click")
    assert not ok and any("region" in e for e in err)
    assert sch.glob_pattern({"year": "2023", "month": "01", "region": "us-east"}) == (
        "year=2023/month=01/day=*/hour=*/region=us-east/eventType=*"
    )
    assert sch.extract_keys(valid, ["year", "month", "region"]) == {
        "year": "2023", "month": "01", "region": "us-east",
    }
    daily = eng.time_partitioner("daily", fmt="hive")
    hourly = eng.time_partitioner("hourly", fmt="hive")
    d = datetime(2023, 1, 15, 12)
    assert daily.path_for(d) == "year=2023/month=01/day=15"
    assert hourly.path_for(d) == "year=2023/month=01/day=15/hour=12"
