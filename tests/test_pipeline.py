import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def objects(spark):
    rows = [
        ("data/year=2023/month=01/a.json", 10),
        ("data/year=2023/month=02/b.json", 20),
        ("data/temp/c.json", 30),
        ("logs/d.txt", 40),
        ("data/year=2023/month=03/fail.json", 50),
    ]
    return spark.createDataFrame(rows, "key string, size bigint")


def test_find_matching_negation(objects):
    from rehiver_spark.operators.pipeline import find_matching

    got = {r["key"] for r in find_matching(objects, ["data/**/*.json", "!**/temp/**"]).collect()}
    assert got == {
        "data/year=2023/month=01/a.json",
        "data/year=2023/month=02/b.json",
        "data/year=2023/month=03/fail.json",
    }


def _make_processor():
    # Defined via a factory so cloudpickle serializes the closure by value;
    # a module-level function would be pickled by reference and fail to
    # import on executors (tests/ is not on the executor PYTHONPATH).
    def processor(key: str) -> str:
        if "fail" in key:
            raise ValueError("boom")
        return f"ok:{len(key)}"

    return processor


def test_process_matching_error_tolerant(objects):
    from rehiver_spark.operators.pipeline import (
        find_matching,
        pipeline_stats,
        process_matching,
    )

    matched = find_matching(objects, ["data/**/*.json", "!**/temp/**"])
    log = process_matching(matched, _make_processor())
    rows = {r["key"]: r for r in log.collect()}
    assert rows["data/year=2023/month=03/fail.json"]["status"] == "skipped"
    assert "ValueError: boom" in rows["data/year=2023/month=03/fail.json"]["error"]
    assert rows["data/year=2023/month=01/a.json"]["status"] == "processed"
    st = pipeline_stats(log)
    assert (st.matched, st.processed, st.skipped, st.skipped_existing) == (3, 2, 1, 0)


def test_skip_existing_anti_join(spark, objects):
    from rehiver_spark.operators.pipeline import stream_process

    done = spark.createDataFrame([("data/year=2023/month=01/a.json",)], "key string")
    log, stats = stream_process(
        objects, ["data/**/*.json", "!**/temp/**"], _make_processor(), skip_existing=done
    )
    st = stats.first()
    assert (st["matched"], st["processed"], st["skipped"], st["skipped_existing"]) == (3, 1, 1, 1)


def test_stream_process_incremental(spark, tmp_path):
    import pyspark.sql.functions as F

    from rehiver_spark.operators.pipeline import stream_process_incremental

    src = str(tmp_path / "src")
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 4).alias("part")
    )
    df.write.partitionBy("part").parquet(src)
    schema = spark.read.parquet(src).schema

    log, stats = stream_process_incremental(
        spark,
        src,
        schema,
        ["part=1/**", "part=2/**"],
        _make_processor(),
        log_dir=str(tmp_path / "log"),
        checkpoint=str(tmp_path / "ckpt"),
        max_files_per_trigger=2,
    )
    st = stats.first()
    n_matched_files = len(
        [f for f in spark.read.parquet(src).inputFiles() if "part=1" in f or "part=2" in f]
    )
    assert st["matched"] == n_matched_files
    assert st["processed"] == n_matched_files  # no 'fail' in parquet names
    assert log.select("batch_id").distinct().count() > 1  # really incremental

    # second run with same checkpoint: nothing new to process
    log2, stats2 = stream_process_incremental(
        spark,
        src,
        schema,
        ["part=1/**", "part=2/**"],
        _make_processor(),
        log_dir=str(tmp_path / "log"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    assert stats2.first()["matched"] == st["matched"]  # log unchanged


def test_on_progress_callbacks(spark, tmp_path):
    import time

    import pyspark.sql.functions as F

    from rehiver_spark.operators.pipeline import stream_process, stream_process_incremental
    from rehiver_spark.streaming.windows import query_progress_listener

    objects = spark.createDataFrame(
        [("data/a.json",), ("data/b.json",), ("x/temp/c.json",)], "key string"
    )
    calls = []
    stream_process(objects, ["data/**"], _make_processor(), on_progress=calls.append)
    assert calls == [
        {"processed": 2, "total": 2, "matched": 2, "skipped_existing": 0}
    ]

    # incremental: per-batch cumulative progress, monotone totals
    src = str(tmp_path / "psrc")
    spark.range(40).select(F.col("id"), (F.col("id") % 2).alias("part")).write.partitionBy(
        "part"
    ).parquet(src)
    schema = spark.read.parquet(src).schema
    batches = []
    log, stats = stream_process_incremental(
        spark,
        src,
        schema,
        ["part=0/**", "part=1/**"],
        _make_processor(),
        log_dir=str(tmp_path / "plog"),
        checkpoint=str(tmp_path / "pckpt"),
        max_files_per_trigger=1,
        on_progress=batches.append,
    )
    assert len(batches) > 1
    assert batches[-1]["matched"] == stats.first()["matched"]
    assert [b["total"] for b in batches] == sorted(b["total"] for b in batches)

    # listener surface: at least one progress event with input rows
    events = []
    from rehiver_spark.streaming.windows import read_file_stream, run_available_now

    with query_progress_listener(spark, events.append):
        sdf = read_file_stream(spark, src, schema)
        run_available_now(
            sdf.groupBy("part").agg(F.count("*").alias("n")), output_mode="complete"
        )
        for _ in range(40):  # listener delivery is async
            if any(e["num_input_rows"] > 0 for e in events):
                break
            time.sleep(0.25)
    assert any(e["num_input_rows"] > 0 for e in events)
    assert all("batch_id" in e and "query_id" in e for e in events)


def test_on_progress_does_not_rerun_processor(spark, tmp_path):
    import os

    from rehiver_spark.operators.pipeline import stream_process

    marker = str(tmp_path / "proc_calls")
    os.makedirs(marker, exist_ok=True)

    def processor(key):
        # executor-side side effect observable from the driver (local mode)
        with open(os.path.join(marker, key.replace("/", "_")), "a") as f:
            f.write("x")
        return 1

    objects = spark.createDataFrame([(f"k{i}",) for i in range(6)], "key string")
    calls = []
    log, stats = stream_process(objects, ["k?"], processor, on_progress=calls.append)
    assert calls[0]["processed"] == 6
    log.count()  # consume the log again after the eager stats pass
    sizes = {f: os.path.getsize(os.path.join(marker, f)) for f in os.listdir(marker)}
    assert len(sizes) == 6 and all(v == 1 for v in sizes.values()), sizes


def test_cancel_before_start_raises(objects):
    from rehiver_spark.operators.pipeline import (
        CancelHandle,
        PipelineCancelled,
        stream_process,
    )

    h = CancelHandle()
    h.cancel()
    with pytest.raises(PipelineCancelled, match="before"):
        stream_process(objects, ["data/**"], _make_processor(), cancel=h)


def test_cancel_mid_job_kills_job_group(objects):
    """cancel() during the eager action cancels the Spark job group and
    surfaces as PipelineCancelled (reference abortSignal → throw)."""
    import threading
    import time

    from rehiver_spark.operators.pipeline import (
        CancelHandle,
        PipelineCancelled,
        stream_process,
    )

    h = CancelHandle()

    def slow_processor(key: str) -> str:
        time.sleep(30)  # far longer than the cancel delay
        return "done"

    threading.Timer(2.0, h.cancel).start()
    t0 = time.monotonic()
    with pytest.raises(PipelineCancelled, match="running"):
        stream_process(objects, ["data/**"], slow_processor, cancel=h)
    # the 5 keys x 30s processor would take minutes uncancelled; the
    # job group kill must cut it short
    assert time.monotonic() - t0 < 25


def test_cancel_incremental_partial_stats(spark, tmp_path):
    """Cancelling between micro-batches stops scheduling, returns
    partial stats over committed batches, and leaves the remainder
    replayable from the checkpoint (reference break-with-partial)."""
    from pyspark.sql import functions as F

    from rehiver_spark.operators.pipeline import (
        CancelHandle,
        stream_process_incremental,
    )

    src = str(tmp_path / "src")
    spark.range(100).select(F.col("id"), (F.col("id") % 4).alias("part")).write.partitionBy(
        "part"
    ).parquet(src)
    schema = spark.read.parquet(src).schema
    n_all = len(spark.read.parquet(src).inputFiles())

    h = CancelHandle()
    progressed = []

    def on_progress(p):
        progressed.append(p)
        h.cancel()  # cancel as soon as the FIRST batch commits

    log, stats = stream_process_incremental(
        spark,
        src,
        schema,
        "**",
        _make_processor(),
        log_dir=str(tmp_path / "log"),
        checkpoint=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        on_progress=on_progress,
        cancel=h,
    )
    st = stats.first()
    assert 0 < st["matched"] < n_all, "expected PARTIAL progress"
    assert len(progressed) < n_all

    # resume with the same checkpoint and no cancel: the uncommitted
    # batches replay exactly-once and the log completes
    log2, stats2 = stream_process_incremental(
        spark,
        src,
        schema,
        "**",
        _make_processor(),
        log_dir=str(tmp_path / "log"),
        checkpoint=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    st2 = stats2.first()
    assert st2["matched"] == n_all
    assert log2.select("key").distinct().count() == n_all


def test_cancel_does_not_mask_real_processor_failure(spark, tmp_path):
    """A genuine processor error that races a cancel() must still
    surface — only failures provably caused by the cancel path are
    absorbed as a clean partial return."""
    import pytest
    from pyspark.sql import functions as F

    from rehiver_spark.operators.pipeline import (
        CancelHandle,
        stream_process_incremental,
    )

    src = str(tmp_path / "src")
    spark.range(20).select(F.col("id"), (F.col("id") % 2).alias("part")).write.partitionBy(
        "part"
    ).parquet(src)
    schema = spark.read.parquet(src).schema

    h = CancelHandle()

    def on_progress(p):
        # a real bug in user code that fires in the same instant a
        # cancel lands: the flag is set, but the failure is NOT the
        # cancel path's PipelineCancelled
        h._flag.set()
        raise ValueError("genuine user-callback bug")

    with pytest.raises(Exception) as ei:
        stream_process_incremental(
            spark,
            src,
            schema,
            "**",
            _make_processor(),
            log_dir=str(tmp_path / "log"),
            checkpoint=str(tmp_path / "ckpt"),
            max_files_per_trigger=1,
            on_progress=on_progress,
            cancel=h,
        )
    # the genuine failure surfaced (not swallowed as a clean cancel)
    assert "genuine user-callback bug" in str(ei.value)

    # unit check of the discriminator itself
    from rehiver_spark.operators.pipeline import PipelineCancelled, _is_cancel_failure

    assert _is_cancel_failure(PipelineCancelled("x"), h)
    wrapped = RuntimeError("query failed: ... PipelineCancelled: cancelled before batch 3 ...")
    assert _is_cancel_failure(wrapped, h)
    assert _is_cancel_failure(RuntimeError(f"job killed: {h.group_id}"), h)
    assert not _is_cancel_failure(ValueError("disk full"), h)
