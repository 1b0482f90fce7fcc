"""Structured Streaming operators (SURVEY §2 C17).

The reference's "incremental processing" is batch re-listing + change
detection; its streaming analog in Spark is the file source with
``Trigger.AvailableNow`` (SURVEY §7 step 7 note: Spark's file source
never reprocesses modified files, so ``modified`` stays with the batch
change-detector join; streaming covers appends).

Window transforms below are plain DataFrame functions usable on BOTH
batch and streaming frames — that is what makes them oracle-checkable:
the driver replays the same parquet through the batch path and the
results must agree (all data on time ⇒ watermarking drops nothing).
"""

from __future__ import annotations

import tempfile
from uuid import uuid4

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str = "ts", delay: str = "10 minutes") -> DataFrame:
    """Late-data bound; on batch frames withWatermark is a no-op, which
    keeps these transforms replayable for the oracle."""
    return df.withWatermark(ts_col, delay) if df.isStreaming else df


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    every: str = "1 hour",
    group_cols: list[str] | None = None,
    value_col: str | None = "value",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window aggregation: count + sum per window (the
    flagship 'hourly metrics' shape, reference README.md:43-57)."""
    d = with_watermark(df, ts_col, watermark)
    keys = [F.window(F.col(ts_col), every).alias("w"), *(group_cols or [])]
    aggs = [F.count("*").alias("n_events")]
    if value_col:
        aggs.append(F.sum(value_col).alias("sum_value"))
    out = d.groupBy(*keys).agg(*aggs)
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *(group_cols or []),
        *[c for c in out.columns if c not in ("w", *(group_cols or []))],
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    length: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    d = with_watermark(df, ts_col, watermark)
    out = d.groupBy(F.window(F.col(ts_col), length, slide).alias("w")).agg(
        F.count("*").alias("n_events")
    )
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "n_events",
    )


def session_counts(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "5 minutes",
    group_cols: list[str] | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session windows (gap-based). Streaming requires a watermark;
    batch replays identically."""
    d = with_watermark(df, ts_col, watermark)
    out = d.groupBy(
        F.session_window(F.col(ts_col), gap).alias("w"), *(group_cols or [])
    ).agg(F.count("*").alias("n_events"))
    return out.select(
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        *(group_cols or []),
        "n_events",
    )


def dedup_within_watermark(
    df: DataFrame, keys: list[str], ts_col: str = "ts", delay: str = "10 minutes"
) -> DataFrame:
    """Streaming dedup bounded by the watermark; falls back to plain
    dropDuplicates on batch frames (exact, unbounded)."""
    if df.isStreaming:
        return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


# ---------------------------------------------------------------------------
# Runners
# ---------------------------------------------------------------------------


def read_file_stream(
    spark: SparkSession,
    path: str,
    schema,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream (the batchSize analog is maxFilesPerTrigger,
    reference batchSize=100 at src/index.ts:1466-1469)."""
    r = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.load(path)


def stage_stream_source(df: DataFrame, src: str, n_triggers: int = 2):
    """Write ``df`` as the parquet file-source for a streaming fixture
    and return ``(n_files, src_bytes, max_files_per_trigger)`` dialed
    for exactly ``n_triggers`` AvailableNow micro-batches.

    The write keeps the frame's NATURAL scan width (the c17e r12
    lesson: a fixed ``repartition(4)`` both serialized a wide staging
    write through one 4-task shuffle and capped the stream scan at
    4-way parallelism — measured 3.3 → 1.1 s on the 10M-row sf10
    events staging). When the natural width yields fewer files than
    ``n_triggers`` (tiny inputs read as one split), the write is
    redone at ``repartition(n_triggers)`` — only tiny scales pay that
    rewrite, and it preserves the multi-trigger incremental
    state-merge exercise the streaming fixtures certify at EVERY
    scale. Order of rows never matters to callers by contract
    (complete-mode aggregations only)."""
    import math
    import os

    df.write.mode("overwrite").parquet(src)
    files = [e for e in os.scandir(src) if e.name.endswith(".parquet")]
    if len(files) < n_triggers:
        df.repartition(n_triggers).write.mode("overwrite").parquet(src)
        files = [e for e in os.scandir(src) if e.name.endswith(".parquet")]
    src_bytes = sum(e.stat().st_size for e in files)
    mfpt = max(1, math.ceil(len(files) / n_triggers))
    return len(files), src_bytes, mfpt


ROCKSDB_PROVIDER = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def query_progress_listener(spark, callback):
    """Context manager forwarding Structured Streaming progress to a
    user callback — the engine-level analog of the reference's
    onProgress surface (src/index.ts:1249-1262): where the reference
    reports driver-loop counters, Spark's StreamingQueryListener
    reports per-micro-batch input rows and throughput for EVERY query
    on the session, at driver cost only (no executor work).

    Usage::

        with query_progress_listener(spark, cb):
            run_available_now(sdf, ...)

    ``cb`` receives dicts: {query_id, batch_id, num_input_rows,
    processed_rows_per_second, duration_ms}. Listener events are
    delivered asynchronously — after a query finishes, the last batch's
    event may trail by a moment.
    """
    import contextlib

    from pyspark.sql.streaming import StreamingQueryListener

    class _L(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = event.progress
            callback(
                {
                    "query_id": str(p.id),
                    "batch_id": p.batchId,
                    "num_input_rows": p.numInputRows,
                    "processed_rows_per_second": p.processedRowsPerSecond,
                    "duration_ms": dict(p.durationMs or {}),
                }
            )

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    @contextlib.contextmanager
    def _ctx():
        listener = _L()
        spark.streams.addListener(listener)
        try:
            yield listener
        finally:
            spark.streams.removeListener(listener)

    return _ctx()


def suggest_state_partitions(spark, input_bytes: int, target_bytes: int = 2 << 20) -> int:
    """Scale-aware default for streaming state partitions.

    Each shuffle partition of a stateful operator carries its own state
    store (two per stream-stream join side) with fixed setup/commit
    cost per micro-batch, so tiny inputs want few partitions while a
    100 TB stream wants the session's full shuffle width. Partitions ∝
    input bytes / 2 MB, clamped to [1, session shuffle partitions] —
    at cluster scale the clamp leaves the admin-sized conf in charge,
    so ``target_bytes`` is purely the small-input ramp.

    The 2 MB ramp is MEASURED, not guessed (round 6, c17d stream-stream
    join): compressed parquet bytes badly understate join state (row
    objects + two stores per side), and the old 64 MB ramp left a
    17 MB sf1 input on ONE state store — 16.95 s vs 3.65 s at 8
    partitions (the 2 MB ramp's pick); 16 partitions already regresses
    to 4.59 s (per-store setup), and at sf0.1 (1.7 MB) the ramp still
    picks the single store that round-3 tuning measured best there.
    """
    session_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    return max(1, min(session_parts, (input_bytes + target_bytes - 1) // target_bytes))


def run_available_now(
    sdf: DataFrame,
    output_mode: str = "complete",
    checkpoint: str | None = None,
    timeout_sec: int = 300,
    state_store: str | None = None,
    state_partitions: int | None = None,
) -> DataFrame:
    """Run a streaming frame to completion with Trigger.AvailableNow
    into an in-memory sink; returns the final result as a DataFrame.

    ``complete`` mode emits the final state of every window — append
    mode would withhold windows past the terminal watermark forever,
    a classic AvailableNow pitfall.

    ``state_store="rocksdb"`` switches the session to the RocksDB
    state-store provider before starting — the right choice when join
    or aggregation state exceeds executor heap (the default HDFS-backed
    provider keeps every partition's state as in-heap maps). Session-
    wide setting; restored after the run.

    ``state_partitions`` pins ``spark.sql.shuffle.partitions`` for this
    run only (restored after) — the number of state stores a stateful
    query creates. Runner-level tuning knob; ``None`` leaves the
    session conf alone. See :func:`suggest_state_partitions` for a
    size-proportional default.
    """
    name = f"mem_{uuid4().hex[:12]}"
    conf = sdf.sparkSession.conf
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = conf.get(key, None)
    parts_key = "spark.sql.shuffle.partitions"
    prev_parts = conf.get(parts_key)
    q = None
    # conf overrides and .start() both live inside the try: a start-time
    # AnalysisException must not leak a pinned partition count (often 1
    # at small inputs) into the session
    try:
        if state_store == "rocksdb":
            conf.set(key, ROCKSDB_PROVIDER)
        if state_partitions is not None:
            conf.set(parts_key, str(state_partitions))
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", checkpoint or tempfile.mkdtemp(prefix="ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(timeout_sec):
            # timed out mid-drain: returning spark.table(name) here
            # would hand back TRUNCATED aggregates indistinguishable
            # from a complete run — fail loudly instead
            raise TimeoutError(
                f"streaming query did not drain within {timeout_sec}s; "
                "partial results discarded (raise timeout_sec or shrink "
                "the backlog)"
            )
    finally:
        if q is not None and q.isActive:
            q.stop()
        if state_store == "rocksdb":
            if prev is None:
                conf.unset(key)
            else:
                conf.set(key, prev)
        if state_partitions is not None:
            conf.set(parts_key, prev_parts)
    spark = sdf.sparkSession
    return spark.table(name)


def foreach_batch_collecting(
    sdf: DataFrame,
    fn,
    checkpoint: str | None = None,
    timeout_sec: int = 300,
    output_mode: str = "append",
):
    """foreachBatch sink runner (reference per-batch processing loop,
    src/index.ts:1498-1530): fn(batch_df, batch_id) per micro-batch,
    AvailableNow, blocks until drained. Stateful update-mode operators
    need ``output_mode='update'``."""
    q = (
        sdf.writeStream.foreachBatch(fn)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint or tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_sec):
            # a silent partial drain would be indistinguishable from a
            # complete one; committed epochs stay replay-safe in the
            # checkpoint, so failing loudly loses nothing
            raise TimeoutError(
                f"streaming query did not drain within {timeout_sec}s"
            )
    finally:
        if q.isActive:
            q.stop()
