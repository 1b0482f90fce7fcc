"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (SURVEY §7 step 5: hive-
partitioned write of events → time-range pruned read → hourly metrics,
reference README.md:43-57). ``queries()``/``oracle_sql()`` expose the
declared operator set from SURVEY.md §2 (registered in
``rehiver_spark.queries``): every exact operator has a DuckDB twin;
approximate/UDF-opaque operators register without one (rows-only).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: hourly metrics over a time-pruned hive-partitioned scan."""
    from rehiver_spark.flagship import hourly_metrics

    return hourly_metrics(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from rehiver_spark.queries import QUERIES, load_all

    load_all()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from rehiver_spark.queries import ORACLE, load_all

    load_all()
    return dict(ORACLE)
