import pytest
from pyspark.sql import functions as F

from rehiver_spark.session import read_events


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return read_events(spark, sf_dir)


def test_tumbling_batch_counts(events):
    from rehiver_spark.streaming.windows import tumbling_counts

    out = tumbling_counts(events, every="1 hour").orderBy("window_start")
    rows = out.collect()
    assert sum(r["n_events"] for r in rows) == events.count()
    # windows are aligned hours
    assert all(r["window_start"].minute == 0 for r in rows)


def test_session_and_sliding_batch(events):
    from rehiver_spark.streaming.windows import session_counts, sliding_counts

    s = sliding_counts(events, length="1 hour", slide="30 minutes").collect()
    assert len(s) > 0
    g = session_counts(events, gap="5 minutes", group_cols=["user_id"]).collect()
    assert sum(r["n_events"] for r in g) == events.count()


def test_streaming_available_now_matches_batch(spark, events, tmp_path):
    from rehiver_spark.streaming.windows import (
        read_file_stream,
        run_available_now,
        tumbling_counts,
    )

    # stage events as a plain-parquet dir (micro-ts already normalized)
    src = str(tmp_path / "events_src")
    events.write.parquet(src)
    batch_df = spark.read.parquet(src)
    sdf = read_file_stream(spark, src, batch_df.schema, max_files_per_trigger=8)
    got = {
        (r["window_start"], r["window_end"]): (r["n_events"], round(r["sum_value"], 6))
        for r in run_available_now(tumbling_counts(sdf, every="1 hour")).collect()
    }
    exp = {
        (r["window_start"], r["window_end"]): (r["n_events"], round(r["sum_value"], 6))
        for r in tumbling_counts(batch_df, every="1 hour").collect()
    }
    assert got == exp and len(got) > 0


def test_dedup_within_watermark_batch_parity(spark):
    from rehiver_spark.streaming.windows import dedup_within_watermark

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:01:00"), (2, "2024-01-01 00:02:00")],
        "id bigint, ts_s string",
    ).select("id", F.col("ts_s").cast("timestamp").alias("ts"))
    assert dedup_within_watermark(df, ["id"]).count() == 2


def test_running_totals_stateful(spark, tmp_path):
    import pyspark.sql.functions as F

    from rehiver_spark.session import read_events
    from rehiver_spark.streaming.stateful import running_totals_stateful
    from rehiver_spark.streaming.windows import foreach_batch_collecting, read_file_stream

    ev = read_events(spark, "/root/testdata/sf0.001").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)
    schema = spark.read.parquet(src).schema

    sdf = read_file_stream(spark, src, schema, max_files_per_trigger=2)
    out = running_totals_stateful(sdf)

    finals = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            finals[r["key"]] = (r["n_events"], r["sum_value"])  # latest update wins

    foreach_batch_collecting(out, sink, checkpoint=str(tmp_path / "ckpt"), output_mode="update")

    expected = {
        r["user_id"]: (r["n"], r["s"])
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(finals) == set(expected)
    for k, (n, s) in expected.items():
        assert finals[k][0] == n
        assert abs(finals[k][1] - s) < 1e-6


def test_rocksdb_state_store_runs_and_matches(spark, tmp_path):
    """The RocksDB provider produces the same windowed result as the
    default HDFS-backed provider, and the session conf is restored."""
    import pyspark.sql.functions as F
    from rehiver_spark.streaming.windows import (
        read_file_stream,
        run_available_now,
        tumbling_counts,
    )

    src = str(tmp_path / "ev")
    rows = [(i, f"2024-01-01 0{i % 6}:10:00") for i in range(60)]
    df = spark.createDataFrame(rows, "v long, ts_s string").select(
        "v", F.col("ts_s").cast("timestamp").alias("ts"), F.lit(1.0).alias("value")
    )
    df.repartition(2).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    key = "spark.sql.streaming.stateStore.providerClass"
    before = spark.conf.get(key, None)

    def run(store):
        sdf = read_file_stream(spark, src, schema)
        res = run_available_now(tumbling_counts(sdf, "ts", "1 hour"), state_store=store)
        return sorted(
            (r.window_start, r.n_events) for r in res.select("window_start", "n_events").collect()
        )

    assert run("rocksdb") == run(None) != []
    assert spark.conf.get(key, None) == before


def test_run_available_now_restores_conf_on_start_failure(spark, tmp_path):
    """A start-time AnalysisException must not leak the pinned state
    partition count into the session."""
    import pyspark.sql.functions as F
    import pytest

    from rehiver_spark.streaming.windows import read_file_stream, run_available_now

    src = str(tmp_path / "src")
    spark.range(10).select(F.col("id"), F.lit("x").alias("s")).write.parquet(src)
    schema = spark.read.parquet(src).schema
    before = spark.conf.get("spark.sql.shuffle.partitions")
    # complete mode without aggregation is rejected at start
    sdf = read_file_stream(spark, src, schema)
    with pytest.raises(Exception):
        run_available_now(sdf, output_mode="complete", state_partitions=1)
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_stream_incremental_dedup_exactly_once(spark, tmp_path):
    """Continuous-ingest dedup: files arrive in micro-batches, each
    deduped against the on-disk hash index of everything accepted so
    far; accepted set == batch-mode global dedup; a drained re-run
    accepts nothing new; late files dedup against all history."""
    from pyspark.sql import functions as F

    from rehiver_spark.operators.dedup import (
        content_hash,
        stream_incremental_dedup,
    )

    src = str(tmp_path / "src")
    docs = [
        (1, "alpha doc"), (2, "beta doc"), (3, "alpha doc"),   # file A (in-file dup)
        (4, "gamma doc"), (5, "Beta  Doc"),                    # file B (cross-file dup of 2)
    ]
    schema = "doc_id bigint, text string"

    def stage(rows, name):
        # the file source reads files in the source root (subdirs are
        # partition-dir territory) — stage each arrival as one file
        import glob as _glob
        import os
        import shutil

        tmp = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        os.makedirs(src, exist_ok=True)
        shutil.copy(_glob.glob(f"{tmp}/part-*.parquet")[0], f"{src}/{name}.parquet")

    stage(docs[:3], "a")
    stage(docs[3:], "b")

    kw = dict(
        index_dir=str(tmp_path / "idx"),
        accepted_dir=str(tmp_path / "acc"),
        checkpoint=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,  # force multiple micro-batches
    )
    acc = stream_incremental_dedup(spark, src, schema, **kw)
    got = {r["doc_id"] for r in acc.collect()}
    # one keeper per distinct normalized text; keepers are batch-order
    # dependent across files, so assert the invariants not exact ids
    assert len(got) == 3
    assert acc.select("content_sha").distinct().count() == 3
    texts = {r["t"] for r in acc.select(F.lower(F.col("text")).alias("t")).collect()}
    assert len(texts) == 3

    # drained re-run: checkpoint skips all seen files, accepts nothing new
    acc2 = stream_incremental_dedup(spark, src, schema, **kw)
    assert acc2.count() == 3

    # late file: one novel text + one dup of history -> exactly 1 accepted
    stage([(6, "delta doc"), (7, "ALPHA DOC ")], "c")
    acc3 = stream_incremental_dedup(spark, src, schema, **kw)
    assert acc3.count() == 4
    new_rows = {r["doc_id"] for r in acc3.collect()} - got
    assert new_rows == {6}


def test_compact_dedup_index_preserves_membership(spark, tmp_path):
    import os

    from rehiver_spark.operators.dedup import (
        compact_dedup_index,
        stream_incremental_dedup,
    )

    src = str(tmp_path / "src")
    schema = "doc_id bigint, text string"

    def stage(rows, name):
        import glob as _glob
        import shutil

        tmp = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        os.makedirs(src, exist_ok=True)
        shutil.copy(_glob.glob(f"{tmp}/part-*.parquet")[0], f"{src}/{name}.parquet")

    stage([(1, "alpha"), (2, "beta")], "a")
    stage([(3, "gamma")], "b")
    kw = dict(
        index_dir=str(tmp_path / "idx"),
        accepted_dir=str(tmp_path / "acc"),
        checkpoint=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    stream_incremental_dedup(spark, src, schema, **kw)
    idx_dir = kw["index_dir"]
    before = {e for e in os.listdir(idx_dir) if e.startswith("batch_id=")}
    assert len(before) >= 2  # one partition per micro-batch

    n = compact_dedup_index(spark, idx_dir)
    assert n == 3
    after = {e for e in os.listdir(idx_dir) if e.startswith("batch_id=")}
    assert after == {"batch_id=-1"}

    # post-compaction ingest still dedups against compacted history
    stage([(4, "alpha"), (5, "delta")], "c")
    acc = stream_incremental_dedup(spark, src, schema, **kw)
    got = {r["doc_id"] for r in acc.collect()}
    assert 4 not in got and 5 in got and len(got) == 4


def test_compact_dedup_index_idempotent(spark, tmp_path):
    import os

    from rehiver_spark.operators.dedup import compact_dedup_index

    idx = str(tmp_path / "idx")
    spark.createDataFrame([("a",), ("b",)], "content_sha string").write.parquet(
        f"{idx}/batch_id=0"
    )
    spark.createDataFrame([("b",), ("c",)], "content_sha string").write.parquet(
        f"{idx}/batch_id=1"
    )
    assert compact_dedup_index(spark, idx) == 3
    # re-compacting an already-compacted index is a no-op in content;
    # each compaction promotes into a FRESH negative id (crash safety:
    # nothing is deleted before its replacement is fully visible)
    assert compact_dedup_index(spark, idx) == 3
    assert {e for e in os.listdir(idx) if e.startswith("batch_id=")} == {"batch_id=-2"}


def test_compact_dedup_index_crash_window_loses_nothing(spark, tmp_path):
    """A crash between the consolidated-partition promote and the old-
    partition sweep must leave every hash readable (duplicates are
    membership-neutral); the next compaction folds the leftovers."""
    import os

    from rehiver_spark.operators.dedup import compact_dedup_index

    idx = str(tmp_path / "idx")
    spark.createDataFrame([("a",), ("b",)], "content_sha string").write.parquet(
        f"{idx}/batch_id=0"
    )
    assert compact_dedup_index(spark, idx) == 2
    # simulate the crash window of a SECOND compaction: the fresh
    # consolidated partition exists alongside the superseded one
    spark.read.parquet(idx).select("content_sha").distinct().write.parquet(
        f"{idx}/batch_id=-2"
    )
    got = {r["content_sha"] for r in spark.read.parquet(idx).collect()}
    assert got == {"a", "b"}  # nothing lost while both partitions exist
    assert compact_dedup_index(spark, idx) == 2
    assert {e for e in os.listdir(idx) if e.startswith("batch_id=")} == {"batch_id=-3"}


def test_stream_incremental_dedup_replay_overwrites_partial_partition(spark, tmp_path):
    """Crash-replay safety: if an epoch died after half-writing its
    index partition, the replayed batch must OVERWRITE that partition —
    stale hashes from the failed attempt must neither survive nor cause
    the replayed batch to drop its own rows (it reads the index
    excluding its own batch_id)."""
    import glob as _glob
    import os
    import shutil

    from rehiver_spark.operators.dedup import stream_incremental_dedup

    src = str(tmp_path / "src")
    schema = "doc_id bigint, text string"
    tmp = str(tmp_path / "stage")
    spark.createDataFrame([(1, "alpha"), (2, "beta")], schema).coalesce(1)\
        .write.parquet(tmp)
    os.makedirs(src)
    shutil.copy(_glob.glob(f"{tmp}/part-*.parquet")[0], f"{src}/a.parquet")

    idx = str(tmp_path / "idx")
    # simulate a crashed epoch 0: its partition exists and already holds
    # this very batch's hashes (the worst case: trusting it would make
    # the replay drop every row) plus a stale garbage hash
    from rehiver_spark.operators.dedup import content_hash
    from pyspark.sql import functions as F

    crashed = spark.createDataFrame([(1, "alpha")], schema).select(
        content_hash(F.col("text")).alias("content_sha")
    ).unionByName(spark.createDataFrame([("deadbeef",)], "content_sha string"))
    crashed.write.parquet(f"{idx}/batch_id=0")

    acc = stream_incremental_dedup(
        spark, src, schema,
        index_dir=idx,
        accepted_dir=str(tmp_path / "acc"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    # both rows accepted (own half-written partition was ignored)...
    assert acc.count() == 2
    # ...and the garbage hash did not survive the overwrite
    hashes = {r["content_sha"] for r in spark.read.parquet(idx).collect()}
    assert "deadbeef" not in hashes and len(hashes) == 2


def test_stream_incremental_dedup_empty_source_schema_parity(spark, tmp_path):
    """The empty-source fallback must return the SAME columns as the
    normal path (which carries the batch_id partition column) so
    downstream audits and unionByName survive a first empty run."""
    import os

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from rehiver_spark.operators.dedup import stream_incremental_dedup

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    empty = stream_incremental_dedup(
        spark,
        src,
        schema,
        index_dir=str(tmp_path / "idx"),
        accepted_dir=str(tmp_path / "acc"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    assert empty.count() == 0
    assert set(empty.columns) == {"doc_id", "text", "content_sha", "batch_id"}


def test_foreach_batch_timeout_raises_not_truncates(spark, tmp_path):
    """A drain that exceeds timeout_sec must raise TimeoutError — a
    silent partial drain would be indistinguishable from complete."""
    import time

    import pytest
    from pyspark.sql import functions as F

    from rehiver_spark.streaming.windows import (
        foreach_batch_collecting,
        read_file_stream,
    )

    src = str(tmp_path / "src")
    spark.range(20).select(F.col("id"), F.lit(1.0).alias("v")).repartition(
        4
    ).write.parquet(src)
    schema = spark.read.parquet(src).schema
    sdf = read_file_stream(spark, src, schema, max_files_per_trigger=1)

    def slow(batch_df, batch_id):
        time.sleep(2)

    with pytest.raises(TimeoutError):
        foreach_batch_collecting(
            sdf, slow, checkpoint=str(tmp_path / "ckpt"), timeout_sec=1
        )


def test_sliding_window_streaming_matches_batch(spark, events, tmp_path):
    """c17g's transform through the REAL engine: sliding windows under
    AvailableNow equal the batch replay exactly."""
    from rehiver_spark.streaming.windows import (
        read_file_stream,
        run_available_now,
        sliding_counts,
    )

    src = str(tmp_path / "ev_sliding")
    events.write.parquet(src)
    batch_df = spark.read.parquet(src)
    sdf = read_file_stream(spark, src, batch_df.schema, max_files_per_trigger=8)
    got = {
        (r["window_start"], r["window_end"]): r["n_events"]
        for r in run_available_now(sliding_counts(sdf, "ts", "1 hour", "15 minutes")).collect()
    }
    exp = {
        (r["window_start"], r["window_end"]): r["n_events"]
        for r in sliding_counts(batch_df, "ts", "1 hour", "15 minutes").collect()
    }
    assert got == exp and len(got) > 0


def test_stage_stream_source_widths_and_trigger_dial(spark, tmp_path):
    """r13 natural-width staging helper: a frame whose natural width is
    a single split gets rewritten at n_triggers files (tiny scales keep
    the multi-trigger incremental-merge exercise); a wider frame keeps
    its natural file count and mfpt = ceil(files / n_triggers)."""
    import os

    from rehiver_spark.streaming.windows import stage_stream_source

    tiny = spark.range(10).toDF("v").coalesce(1)
    src1 = str(tmp_path / "tiny")
    n, nbytes, mfpt = stage_stream_source(tiny, src1, n_triggers=2)
    files = [e for e in os.scandir(src1) if e.name.endswith(".parquet")]
    assert n == len(files) == 2 and mfpt == 1 and nbytes > 0
    assert {r["v"] for r in spark.read.parquet(src1).collect()} == set(range(10))

    wide = spark.range(1000).toDF("v").repartition(5)
    src2 = str(tmp_path / "wide")
    n, nbytes, mfpt = stage_stream_source(wide, src2, n_triggers=2)
    assert n == 5 and mfpt == 3 and nbytes > 0  # 2 triggers: 3 files + 2 files
