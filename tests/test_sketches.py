"""Count-Min + HyperLogLog sketches (operators/sketches.py): guarantee
properties (CM never underestimates; HLL within its standard-error
envelope), mergeability, and bit-level portability of the register/
counter relations against DuckDB twins."""

import duckdb
import pytest
from pyspark.sql import functions as F

from rehiver_spark.operators.sketches import (
    cm_estimate,
    cm_merge,
    cm_sketch,
    hll_error_bound,
    hll_estimate,
    hll_merge,
    hll_registers,
    hll_registers_sql,
)


@pytest.fixture(scope="module")
def items(spark):
    # zipf-ish frequencies: item k appears 200//(k+1) + 1 times
    rows = [(f"tok{k}",) for k in range(120) for _ in range(200 // (k + 1) + 1)]
    return spark.createDataFrame(rows, "item string")


def test_cm_never_underestimates_and_is_tight_when_wide(spark, items):
    true = {
        r["item"]: r["c"]
        for r in items.groupBy("item").agg(F.count("*").alias("c")).collect()
    }
    qs = spark.createDataFrame([(k,) for k in true], "item string")
    sk = cm_sketch(items, depth=4, width=64)  # narrow: collisions certain
    est = {r["item"]: r["est"] for r in cm_estimate(sk, qs, depth=4, width=64).collect()}
    n = sum(true.values())
    assert all(est[k] >= true[k] for k in true)  # the CM guarantee
    assert all(est[k] <= true[k] + 4 * n / 64 for k in true)  # ε=e/w-ish slack
    wide = cm_sketch(items, depth=4, width=8192)
    est_w = {
        r["item"]: r["est"]
        for r in cm_estimate(wide, qs, depth=4, width=8192).collect()
    }
    assert est_w == true  # wide enough → exact


def test_cm_merge_equals_sketch_of_union(spark, items):
    # deterministic ROW split (not item split: duplicates must land on
    # both sides for the merge to prove counters add, not max)
    w = items.withColumn(
        "h", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(2))
    )
    a, b = w.filter("h = 0").drop("h"), w.filter("h = 1").drop("h")
    merged = cm_merge(cm_sketch(a, width=128), cm_sketch(b, width=128))
    direct = cm_sketch(items, width=128)
    got = {(r["row"], r["bucket"]): r["cnt"] for r in merged.collect()}
    want = {(r["row"], r["bucket"]): r["cnt"] for r in direct.collect()}
    assert got == want


def test_cm_weighted_counts(spark):
    df = spark.createDataFrame([("a", 5), ("a", 7), ("b", 1)], "item string, w int")
    sk = cm_sketch(df, weight_col="w", depth=2, width=512)
    qs = spark.createDataFrame([("a",), ("b",), ("zz",)], "item string")
    est = {r["item"]: r["est"] for r in cm_estimate(sk, qs, depth=2, width=512).collect()}
    assert est == {"a": 12, "b": 1, "zz": 0}


def test_hll_within_error_envelope(spark):
    n = 5000
    df = spark.range(n).select(F.concat(F.lit("u"), F.col("id")).alias("item"))
    for p in (9, 11):
        est = hll_estimate(hll_registers(df, p=p), p=p).first()["est_distinct"]
        se = hll_error_bound(p)
        assert abs(est - n) / n < 4 * se, (p, est)


def test_hll_small_range_linear_counting(spark):
    df = spark.createDataFrame([(f"v{i}",) for i in range(12)], "item string")
    est = hll_estimate(hll_registers(df, p=9), p=9).first()["est_distinct"]
    assert abs(est - 12) <= 1.0  # linear counting is near-exact here


def test_hll_merge_equals_registers_of_union(spark):
    a = spark.range(0, 3000).select(F.concat(F.lit("x"), F.col("id")).alias("item"))
    b = spark.range(2000, 6000).select(F.concat(F.lit("x"), F.col("id")).alias("item"))
    merged = hll_merge(hll_registers(a, p=9), hll_registers(b, p=9))
    direct = hll_registers(a.unionByName(b), p=9)
    got = {(r["idx"]): r["rho"] for r in merged.collect()}
    want = {(r["idx"]): r["rho"] for r in direct.collect()}
    assert got == want
    e1 = hll_estimate(merged, p=9).first()["est_distinct"]
    e2 = hll_estimate(direct, p=9).first()["est_distinct"]
    assert e1 == e2


def test_hll_grouped_per_source(spark):
    rows = [("s0", f"a{i}") for i in range(400)] + [("s1", f"b{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "source string, item string")
    out = {
        r["source"]: r["est_distinct"]
        for r in hll_estimate(
            hll_registers(df, p=9, group_cols=["source"]), p=9, group_cols=["source"]
        ).collect()
    }
    assert abs(out["s0"] - 400) / 400 < 4 * hll_error_bound(9)
    assert abs(out["s1"] - 40) <= 5


def test_hll_registers_bit_identical_to_duckdb(spark):
    df = spark.createDataFrame([(f"item{i}",) for i in range(777)], "item string")
    got = {(r["idx"], r["rho"]) for r in hll_registers(df, p=9).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT 'item' || CAST(range AS VARCHAR) AS item FROM range(777)")
    sql = hll_registers_sql("item", 9, "FROM t")
    want = {(r[0], r[1]) for r in con.execute(sql).fetchall()}
    assert got == want


def test_cm_estimate_plan_broadcasts_sketch(spark, items):
    """The sketch side (≤ d·w rows) must ride a broadcast join — the
    query relation never shuffles for the probe."""
    sk = cm_sketch(items, width=256)
    qs = items.select("item").distinct()
    plan = cm_estimate(sk, qs, width=256)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_streaming_hll_registers_equal_batch(spark, tmp_path):
    """x44's core claim: HLL registers maintained as streaming state
    (multi-trigger AvailableNow) are IDENTICAL to the batch registers —
    max is order- and batching-insensitive."""
    from rehiver_spark.operators.sketches import hll_registers
    from rehiver_spark.streaming.windows import read_file_stream, run_available_now

    ev = spark.range(3000).selectExpr(
        "CAST(id % 7 AS STRING) AS grp", "CAST(id % 911 AS STRING) AS item"
    )
    src = str(tmp_path / "src")
    ev.repartition(5).write.parquet(src)
    schema = spark.read.parquet(src).schema
    sdf = read_file_stream(spark, src, schema, max_files_per_trigger=2)
    streamed = run_available_now(
        hll_registers(sdf, p=9, group_cols=["grp"]),
        checkpoint=str(tmp_path / "ckpt"),
    )
    batch = hll_registers(spark.read.parquet(src), p=9, group_cols=["grp"])
    got = {(r["grp"], r["idx"], r["rho"]) for r in streamed.collect()}
    want = {(r["grp"], r["idx"], r["rho"]) for r in batch.collect()}
    assert got == want and len(got) > 50


# ---------------------------------------------------------------------------
# X47 — HDR quantile sketch
# ---------------------------------------------------------------------------


def test_hdr_bucket_matches_integer_shift_at_octave_boundaries(spark):
    """The double-division bucket must equal the SQL twin's integer
    shift on every value around every octave boundary up to the 2^49
    domain edge, plus the reserved buckets."""
    import duckdb

    from rehiver_spark.operators.sketches import hdr_bucket, hdr_bucket_sql

    vals = [0, 1, 2, 3, 15, 16, 17, -5]
    for e in range(1, 50):
        vals += [(1 << e) - 1, 1 << e, (1 << e) + 1]
    # out-of-domain values → -3 in BOTH engines (the SQL twin used to
    # compute a real bucket id here, and v·sub overflows the shift
    # math near int64 max — r5 advisor finding)
    vals += [(1 << 49) + 7, (1 << 62) + 3, (1 << 63) - 1]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        r["v"]: r["b"]
        for r in df.select("v", hdr_bucket(F.col("v")).alias("b")).collect()
    }
    con = duckdb.connect()
    expect = dict(
        con.sql(
            f"SELECT v, {hdr_bucket_sql('v')} FROM (SELECT unnest({vals}) AS v)"
        ).fetchall()
    )
    for v in vals:  # the twin agrees on the WHOLE BIGINT domain
        assert got[v] == expect[v], v
    assert got[0] == -1 and got[-5] == -2 and got[(1 << 49) + 7] == -3
    assert got[(1 << 63) - 1] == -3


def test_hdr_quantiles_within_relative_error_bound(spark):
    """Estimate vs true quantile: relative error ≤ 1/(2S+1) for every
    group and quantile (the HdrHistogram guarantee)."""
    import random

    from rehiver_spark.operators.sketches import hdr_quantiles, hdr_sketch

    rng = random.Random(7)
    rows = [
        ("g1", int(rng.lognormvariate(5, 1.2)) + 1)
        for _ in range(4000)
    ] + [("g2", rng.randint(1, 10**6)) for _ in range(4000)]
    df = spark.createDataFrame(rows, "g string, v long")
    sk = hdr_sketch(df, "v", group_cols=["g"])
    qs = [(1, 2), (9, 10), (99, 100)]
    got = {
        (r["g"], r["q"]): r["est"]
        for r in hdr_quantiles(sk, qs, group_cols=["g"]).collect()
    }
    by_g = {"g1": sorted(v for g, v in rows if g == "g1"),
            "g2": sorted(v for g, v in rows if g == "g2")}
    for g, vs in by_g.items():
        n = len(vs)
        for num, den in qs:
            true = vs[-(-n * num // den) - 1]  # ceil(n*q)-th order stat
            est = got[(g, f"{num}/{den}")]
            assert abs(est - true) / true <= 1.0 / 33 + 1e-9, (g, num, den, est, true)


def test_hdr_merge_equals_whole_and_is_exact(spark):
    from rehiver_spark.operators.sketches import hdr_merge, hdr_sketch

    df = spark.range(1, 5000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") * 37 % 9973 + 1).alias("v"),
    )
    whole = hdr_sketch(df, "v", group_cols=["g"])
    parts = [hdr_sketch(df.filter(F.col("id") % 4 == i), "v", group_cols=["g"]) for i in range(4)]
    merged = hdr_merge(*parts)
    a = sorted(map(tuple, whole.collect()))
    b = sorted(map(tuple, merged.collect()))
    assert a == b


def test_hdr_sketch_shuffle_is_capped(spark):
    """The sketch relation is fixed-size: a 100x bigger input yields
    the same bucket rows (same keys), so shuffle cardinality is bounded
    by |groups|*S*50 — verified by row count, not by trusting the doc."""
    from rehiver_spark.operators.sketches import hdr_sketch

    small = spark.range(1, 2000).select((F.col("id") % 997 + 1).alias("v"))
    big = spark.range(1, 200000).select((F.col("id") % 997 + 1).alias("v"))
    n_small = hdr_sketch(small, "v").count()
    n_big = hdr_sketch(big, "v").count()
    assert n_big == n_small  # same value universe → same buckets
    assert n_big < 16 * 50


def test_sketch_filter_thresholds_bound_true_p99(spark):
    """X55 invariant: the sketch-derived p99 threshold sits within the
    sketch's relative-error guarantee (1/(2S+1) ≈ 3%) of the EXACT
    per-source p99, and kept+outliers partitions every source."""
    import duckdb

    from rehiver_spark.queries import QUERIES, load_all

    load_all()
    rows = QUERIES["x55_sketch_filter"](spark, "/root/testdata/sf0.001").collect()
    assert rows
    exact = dict(
        duckdb.sql(
            "SELECT source, quantile_disc(length(text), 0.99) FROM "
            "'/root/testdata/sf0.001/documents.parquet' GROUP BY source"
        ).fetchall()
    )
    for r in rows:
        assert r["n_kept"] + r["n_outliers"] == r["n_docs"], r
        true_p99 = exact[r["source"]]
        assert abs(r["p99_threshold"] - true_p99) / true_p99 <= 1 / 33 + 1e-9, (
            r,
            true_p99,
        )
