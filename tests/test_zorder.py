"""Z-order layout writer: roundtrip losslessness + measured file skipping.

The claim under test is the 100 TB one: a Z-ordered layout lets a scan
skip most files from per-file min/max for a box predicate on EITHER
clustered column, where a hash-partitioned layout skips ~nothing.
"""

import pytest


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def test_zorder_roundtrip_and_file_skipping(spark, events, tmp_path_factory):
    from rehiver_spark.sources.writer import (
        file_skip_stats,
        skip_fraction,
        write_zordered,
    )

    zdir = str(tmp_path_factory.mktemp("zorder") / "ev")
    ndir = str(tmp_path_factory.mktemp("zorder") / "naive")
    df = events.select("event_id", "user_id", "value")
    write_zordered(df, zdir, ["user_id", "value"], bits=6, n_files=8)
    df.repartition(8).write.mode("overwrite").parquet(ndir)

    back = spark.read.parquet(zdir)
    assert back.count() == df.count()
    assert back.selectExpr("sum(event_id) s").first()["s"] == \
        df.selectExpr("sum(event_id) s").first()["s"]

    # box predicate: middle ~20% band on both dimensions
    qs = df.approxQuantile(["user_id", "value"], [0.4, 0.6], 0.001)
    box = {
        "user_id": (qs[0][0], qs[0][1]),
        "value": (qs[1][0], qs[1][1]),
    }
    zskip = skip_fraction(file_skip_stats(spark, zdir, ["user_id", "value"]), box)
    nskip = skip_fraction(file_skip_stats(spark, ndir, ["user_id", "value"]), box)
    # hash layout: every file spans ~the full domain -> skips ~nothing;
    # z-layout: the box touches a bounded z-neighborhood
    assert zskip >= 0.25, f"zorder skipped only {zskip:.2f}"
    assert zskip > nskip, (zskip, nskip)


def test_zorder_single_dim_still_prunes(spark, events, tmp_path_factory):
    """Unlike a linear sort on (a, b), the curve prunes on b alone too."""
    from rehiver_spark.sources.writer import (
        file_skip_stats,
        skip_fraction,
        write_zordered,
    )

    zdir = str(tmp_path_factory.mktemp("zorder1d") / "ev")
    df = events.select("event_id", "user_id", "value")
    write_zordered(df, zdir, ["user_id", "value"], bits=6, n_files=16)
    stats = file_skip_stats(spark, zdir, ["user_id", "value"])
    lo, hi = df.approxQuantile("value", [0.0, 0.1], 0.001)
    frac = skip_fraction(stats, {"value": (lo, hi)})
    assert frac > 0.0, "second-dimension predicate should skip some files"


def test_zorder_constant_and_null_columns(spark):
    """Degenerate inputs must not break the curve: a constant column
    collapses to one bucket; nulls go to bucket 0."""
    from pyspark.sql import functions as F

    from rehiver_spark.sources.writer import zorder_value

    df = spark.createDataFrame(
        [(1, 5.0, None), (2, 5.0, 3.0), (3, 5.0, 9.0)],
        "id bigint, const double, sparse double",
    )
    z = df.select(F.col("id"), zorder_value(df, ["const", "sparse"], bits=4).alias("z"))
    rows = {r["id"]: r["z"] for r in z.collect()}
    assert len(rows) == 3 and all(v is not None for v in rows.values())
    # null sorts to the lowest z among these rows (bucket 0 on sparse)
    assert rows[1] == min(rows.values())
