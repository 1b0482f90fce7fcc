"""Spark 4 Python DataSource exposing the objects catalog as a real
pluggable source (SURVEY §4 "optional: Python DataSource"):

    register_objects_source(spark)
    spark.read.format("objects") \
        .option("base", "/data/lake")      # or .option("bucket", "b")
        .option("prefixes", "a/,b/,c/") \
        .load()

One input partition per prefix — listing parallelism is cluster-wide
and planned by Spark itself (vs the reference's driver-side pLimit(5)
pagination, src/index.ts:1036-1161). Rows carry the canonical catalog
schema (key, size, etag, last_modified, content_type).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from rehiver_spark.sources.catalog import OBJECTS_SCHEMA


class _PrefixPartition(InputPartition):
    def __init__(self, prefix: str):
        self.prefix = prefix


class ObjectsDataSource(DataSource):
    """``format("objects")``: object-store catalog as a table."""

    @classmethod
    def name(cls) -> str:
        return "objects"

    def schema(self):
        return OBJECTS_SCHEMA

    def reader(self, schema):
        return ObjectsReader(self.options)


class ObjectsReader(DataSourceReader):
    def __init__(self, options):
        self.base = options.get("base")
        self.bucket = options.get("bucket")
        if not self.base and not self.bucket:
            raise ValueError("objects source requires option 'base' (local) or 'bucket' (s3)")
        self.prefixes = [p for p in (options.get("prefixes") or "").split(",") if p] or [""]

    def partitions(self):
        return [_PrefixPartition(p) for p in self.prefixes]

    def read(self, partition: _PrefixPartition):
        # executed on executors; build the lister locally (no pickled clients)
        from rehiver_spark.sources.catalog import (
            local_lister_factory,
            s3_lister_factory,
        )

        factory = (
            s3_lister_factory(self.bucket) if self.bucket else local_lister_factory(self.base)
        )
        yield from factory()(partition.prefix)


def register_objects_source(spark) -> None:
    """Ship the package to executors (the DataSource class is pickled
    by reference) and register the format."""
    from rehiver_spark.session import ship_package

    ship_package(spark)
    spark.dataSource.register(ObjectsDataSource)
