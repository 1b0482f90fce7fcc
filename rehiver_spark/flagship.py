"""Flagship end-to-end query (SURVEY §7 step 5; reference README.md:43-57):

    "hourly metrics for the last 24 h" — write events hive-partitioned
    ``year=/month=/day=/hour=``, read back with a time-range pruning
    filter (Catalyst PartitionFilters — asserted in tests), aggregate
    per hour.

The write happens once per (process, sf_dir) into a temp dir; the read
path is the part that matters: `range_filter` emits partition-column
predicates, so the scan opens only the 24 matched hour directories no
matter how many the table has.
"""

from __future__ import annotations

import os
import tempfile
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rehiver_spark.operators.timeparts import TimePartitioner
from rehiver_spark.session import read_events

_written: dict[str, str] = {}


def partitioned_events_dir(spark: SparkSession, sf_dir: str) -> str:
    """Events written hive-partitioned by year/month/day/hour (cached).

    The target is a DETERMINISTIC per-sf_dir path (overwritten, not a
    fresh mkdtemp): disk stays bounded at one hive copy per sf_dir
    across any number of processes, instead of leaking one per run."""
    if sf_dir in _written and os.path.isdir(_written[sf_dir]):
        return _written[sf_dir]
    import hashlib

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    out = os.path.join(tempfile.gettempdir(), f"rehiver_events_hive_{tag}")
    ev = read_events(spark, sf_dir)
    (
        ev.withColumns(
            {
                "year": F.year("ts"),
                "month": F.month("ts"),
                "day": F.dayofmonth("ts"),
                "hour": F.hour("ts"),
            }
        )
        .repartition("year", "month", "day")  # one task per day dir, not 32 files/dir
        .write.mode("overwrite")
        .partitionBy("year", "month", "day", "hour")
        .parquet(out)
    )
    _written[sf_dir] = out
    return out


def hourly_metrics(
    spark: SparkSession,
    sf_dir: str,
    end: datetime | None = None,
    hours: int = 24,
) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    base = partitioned_events_dir(spark, sf_dir)
    if end is None:
        # testdata events span 2024-01; default to the last day
        end = datetime(2024, 1, 30, 23, 0, 0)
    start = end - timedelta(hours=hours - 1)
    tp = TimePartitioner(granularity="hourly", fmt="hive")
    df = spark.read.parquet(base).filter(tp.range_filter(start, end))
    return (
        df.groupBy("year", "month", "day", "hour", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value").cast("double"), 2).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("year").cast("bigint").alias("year"),
            F.col("month").cast("bigint").alias("month"),
            F.col("day").cast("bigint").alias("day"),
            F.col("hour").cast("bigint").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
            "n_users",
        )
    )
