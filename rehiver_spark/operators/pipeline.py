"""Pipeline runner: find matching objects → process with per-key stats.

Re-expresses the reference's streamMatchingObjects workflow
(/root/reference/src/index.ts:1376-1544, facade 2435-2517; behaviors
fixed by tests/index.test.ts:1306-1685) as Spark dataflow:

- ``find_matching``: catalog DataFrame + micromatch pattern list →
  matched keys (JVM-side glob predicate). The reference fully
  materializes the match list on the driver before processing
  (src/index.ts:1477-1486); here it stays a DataFrame.
- ``process_matching``: per-key user callback applied on executors via
  ``mapInPandas`` (Arrow-batched). A callback error marks the key
  ``skipped`` and the pipeline continues (reference per-key try/catch →
  skipped++ + warn, src/index.ts:1510-1516) — never fails the job.
- ``pipeline_stats``: {matched, processed, skipped, skipped_existing}
  as ONE aggregation over the processing log (SURVEY §2 R17) — the
  reference's counters (src/index.ts:1426-1431) become
  ``COUNT(*) FILTER (WHERE ...)``.

Batching/concurrency mapping: the reference's batchSize=100 /
maxConcurrentProcessing=10 (src/index.ts:1463-1474) become Spark task
partitioning — ``batch_partitions`` controls parallelism; there is no
inter-batch barrier (strictly better than the reference's per-batch
``Promise.all`` barrier, SURVEY §4 row 7).

skip_existing: the reference declares a ``localCache``/skipExisting
option but never implements it (always 0, src/index.ts:1329,1361); we
implement the *intended* semantics as a left-anti join against a
processed-log DataFrame.
"""

from __future__ import annotations

import itertools
import threading
from collections.abc import Callable, Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rehiver_spark.functions.globs import glob_match

PROCESS_LOG_SCHEMA = "key string, status string, error string, result string"


class PipelineCancelled(RuntimeError):
    """A CancelHandle aborted a pipeline while a Spark job was running
    (the batch analogue of the reference's 'listing was aborted' throw,
    src/index.ts:1155-1157)."""


class CancelHandle:
    """Cooperative cancellation for long pipelines — the reference's
    ``abortSignal`` (src/index.ts:1041-1047, 1304, 1424) mapped onto
    Spark's two execution models:

    - **batch** (:func:`stream_process`): the eager action runs inside
      a Spark job group; ``cancel()`` sets the flag AND calls
      ``cancelJobGroup`` so in-flight stages are killed, not just
      checked-between. A cancelled batch job raises
      :class:`PipelineCancelled` (all-or-nothing — a half-finished
      distributed aggregate has no meaningful partial result).
    - **streaming** (:func:`stream_process_incremental`): the flag is
      checked at each micro-batch boundary; the in-flight batch's epoch
      is NOT committed to the checkpoint, so a later run resumes it
      exactly-once, and the call returns PARTIAL stats over committed
      batches — the reference's ``break`` + partial-stats behavior
      (src/index.ts:1499-1501).

    Thread-safe: ``cancel()`` may be called from any thread (a timer, a
    signal handler, another job's listener).
    """

    _seq = itertools.count()

    def __init__(self) -> None:
        self._flag = threading.Event()
        self._spark = None
        self.group_id = f"rehiver-cancel-{next(self._seq)}"

    def _bind(self, spark) -> None:
        self._spark = spark

    def cancel(self) -> None:
        self._flag.set()
        spark = self._spark
        if spark is not None:
            try:
                spark.sparkContext.cancelJobGroup(self.group_id)
            except Exception:
                pass  # context already stopped — flag alone suffices

    @property
    def cancelled(self) -> bool:
        return self._flag.is_set()


def _is_cancel_failure(exc: BaseException, cancel: CancelHandle) -> bool:
    """True iff a streaming-query failure provably originated from the
    cancel path: the PipelineCancelled raised at a micro-batch boundary
    (PySpark embeds the foreachBatch traceback in the
    StreamingQueryException text) or a job killed via the handle's job
    group. A processor bug or I/O error that merely RACES a cancel()
    must not be absorbed as a clean cancellation."""
    seen: set[int] = set()
    e: BaseException | None = exc
    while e is not None and id(e) not in seen:
        seen.add(id(e))
        if isinstance(e, PipelineCancelled):
            return True
        text = str(e)
        if "PipelineCancelled" in text or cancel.group_id in text:
            return True
        e = e.__cause__ or e.__context__
    return False


def find_matching(
    objects: DataFrame,
    patterns: str | list[str],
    prefix: str = "",
    key_col: str = "key",
    dot: bool = False,
    nocase: bool = False,
) -> DataFrame:
    """Matched subset of an objects catalog (reference
    findMatchingObjects, src/index.ts:1237-1366): prefix pushdown then
    micromatch list semantics, all as codegen'd predicates."""
    out = objects
    if prefix:
        out = out.filter(F.col(key_col).startswith(prefix))
    return out.filter(glob_match(F.col(key_col), patterns, dot=dot, nocase=nocase))


def process_matching(
    matched: DataFrame,
    processor: Callable[[str], object],
    key_col: str = "key",
    batch_partitions: int | None = None,
    skip_existing: DataFrame | None = None,
) -> DataFrame:
    """Apply ``processor(key)`` to every matched key on executors.

    Returns the processing log ``(key, status, error, result)`` with
    status ∈ {processed, skipped, skipped_existing}. The processor runs
    inside ``mapInPandas`` (Arrow batches); its return value is stringified
    into ``result``. Exceptions are caught per key.

    ``skip_existing``: DataFrame of already-processed keys — anti-joined
    out BEFORE processing, logged as ``skipped_existing`` (intended
    semantics of the reference's inert option, src/index.ts:1259-1263).
    NOTE: this path persists the matched-keys projection (consumed by
    both the semi- and anti-join branches of the returned plan — often
    a full catalog scan + glob filter, worth computing once); the cache
    is registered with ``session.track_persist`` — sessions issuing
    many skip_existing runs release it (and every other operator
    persist) via ``rehiver_spark.session.release_persisted()``.
    """
    from rehiver_spark.session import ship_package

    ship_package(matched.sparkSession)
    keys = matched.select(F.col(key_col).alias("key"))
    existing_log = None
    if skip_existing is not None:
        # keys feeds BOTH the semi join (skipped_existing log) and the
        # anti join (work set); persist so the matched relation — often
        # a full catalog scan + glob filter — is derived once
        from rehiver_spark.session import track_persist

        keys = track_persist(keys)
        existing = skip_existing.select(F.col(key_col).alias("key")).distinct()
        existing_log = (
            keys.join(existing, "key", "left_semi")
            .select(
                "key",
                F.lit("skipped_existing").alias("status"),
                F.lit(None).cast("string").alias("error"),
                F.lit(None).cast("string").alias("result"),
            )
        )
        keys = keys.join(existing, "key", "left_anti")
    if batch_partitions:
        keys = keys.repartition(batch_partitions)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for key in pdf["key"]:
                try:
                    r = processor(key)
                    rows.append((key, "processed", None, None if r is None else str(r)))
                except Exception as e:  # per-key tolerance, never job-fatal
                    rows.append((key, "skipped", f"{type(e).__name__}: {e}", None))
            yield pd.DataFrame(rows, columns=["key", "status", "error", "result"])

    log = keys.mapInPandas(run, schema=PROCESS_LOG_SCHEMA)
    return log.unionByName(existing_log) if existing_log is not None else log


@dataclass
class PipelineStats:
    matched: int
    processed: int
    skipped: int
    skipped_existing: int


def pipeline_stats_df(log: DataFrame) -> DataFrame:
    """R17 stats as one aggregation (oracle form:
    COUNT(*) FILTER (WHERE status = ...))."""
    return log.agg(
        F.count("*").alias("matched"),
        F.count_if(F.col("status") == "processed").alias("processed"),
        F.count_if(F.col("status") == "skipped").alias("skipped"),
        F.count_if(F.col("status") == "skipped_existing").alias("skipped_existing"),
    )


def pipeline_stats(log: DataFrame) -> PipelineStats:
    r = pipeline_stats_df(log).first()
    return PipelineStats(r["matched"], r["processed"], r["skipped"], r["skipped_existing"])


def stream_process(
    objects: DataFrame,
    patterns: str | list[str],
    processor: Callable[[str], object],
    prefix: str = "",
    key_col: str = "key",
    skip_existing: DataFrame | None = None,
    batch_partitions: int | None = None,
    on_progress: Callable[[dict], None] | None = None,
    cancel: CancelHandle | None = None,
) -> tuple[DataFrame, DataFrame]:
    """find → process, returning (log, stats_df) — the reference facade
    streamMatchingObjects (src/index.ts:2435-2517) in one call.

    ``on_progress`` mirrors the reference's onProgress callback
    (src/index.ts:1356-1362, 1518-1540): called once with the final
    ``{processed, total, matched, skipped_existing}`` after the run.
    Passing it forces eager evaluation (the reference is eager always);
    omit it to keep the log lazy. Per-batch granularity lives in
    :func:`stream_process_incremental`, where batches actually exist —
    inside one Spark job there is no driver-visible "batch" to hook.

    CACHING CONTRACT (eager path): the returned ``log`` IS a persisted
    DataFrame — the cache is load-bearing (the user processor may
    side-effect; without it, consuming the log again would re-run the
    processor over every key). It stays cached for the session; call
    ``log.unpersist()`` once done consuming it.

    ``cancel`` is the reference's abortSignal: forces eager evaluation,
    runs the job inside the handle's job group, and raises
    :class:`PipelineCancelled` if cancelled before or during the run
    (see :class:`CancelHandle` for why batch cancel is all-or-nothing).
    """
    eager = on_progress is not None or cancel is not None
    spark = objects.sparkSession
    if cancel is not None:
        cancel._bind(spark)
        if cancel.cancelled:
            raise PipelineCancelled("cancelled before the pipeline started")
    matched = find_matching(objects, patterns, prefix=prefix, key_col=key_col)
    log = process_matching(
        matched,
        processor,
        key_col="key",
        batch_partitions=batch_partitions,
        skip_existing=skip_existing,
    )
    if eager:
        # persist BEFORE the eager stats action: the user processor may
        # side-effect, and without the cache the later log consumption
        # would re-run it over every key (see CACHING CONTRACT above)
        log = log.persist()
    stats_df = pipeline_stats_df(log)
    if eager:
        sc = spark.sparkContext
        try:
            if cancel is not None:
                sc.setJobGroup(cancel.group_id, "rehiver stream_process", True)
            r = stats_df.first()
        except Exception as e:
            if cancel is not None and cancel.cancelled:
                log.unpersist()
                raise PipelineCancelled("cancelled while the job was running") from e
            # genuine failure (processor bug, executor loss): release
            # the cache before propagating — the cancel path above
            # already does, and leaking it here would accumulate
            # executor storage across retry loops
            log.unpersist()
            raise
        finally:
            if cancel is not None:
                # PySpark has no clearJobGroup; reset the local property
                sc.setLocalProperty("spark.jobGroup.id", None)
                sc.setLocalProperty("spark.job.interruptOnCancel", None)
        if cancel is not None and cancel.cancelled:
            log.unpersist()
            raise PipelineCancelled("cancelled while the job was running")
        if on_progress is not None:
            on_progress(
                {
                    "processed": r["processed"] + r["skipped"],
                    "total": r["matched"],
                    "matched": r["matched"],
                    "skipped_existing": r["skipped_existing"],
                }
            )
    return log, stats_df


def stream_process_incremental(
    spark,
    src_dir: str,
    schema,
    patterns: str | list[str],
    processor: Callable[[str], object],
    log_dir: str,
    checkpoint: str,
    max_files_per_trigger: int = 100,
    fmt: str = "parquet",
    on_progress: Callable[[dict], None] | None = None,
    cancel: CancelHandle | None = None,
    timeout_sec: int = 300,
) -> tuple[DataFrame, DataFrame]:
    """INCREMENTAL streamMatchingObjects: Structured Streaming file
    source discovers new files, each micro-batch glob-filters the new
    file PATHS and runs the processor on matches, appending to a
    persistent Parquet processing log (SURVEY §7 step 7).

    ``cancel`` (reference abortSignal, src/index.ts:1424, 1499-1501):
    checked at each micro-batch boundary. On cancel the in-flight
    batch's epoch is NOT committed — the stream stops scheduling, this
    call returns PARTIAL (log, stats) over the batches that committed,
    and a later run with the same checkpoint resumes the uncommitted
    batch exactly-once. Mirrors the reference's ``break`` + partial
    stats, with durability the reference lacks.

    ``max_files_per_trigger`` is the reference's batchSize=100
    (src/index.ts:1466-1469); the checkpoint makes re-runs exactly-once
    over already-seen files — the real ``skipExisting`` (the reference
    declares but never implements it, src/index.ts:1329). Spark's file
    source never re-emits modified files, so ``modified`` handling
    stays with the batch change detector (SURVEY §7 risks).

    ``on_progress`` is the reference's per-batch onProgress callback
    (src/index.ts:1518-1540): invoked after every micro-batch with
    cumulative ``{processed, total, matched, skipped_existing,
    batch_id}`` (total = keys seen so far; an unbounded stream has no
    final total). The counts come from ONE scalar aggregate over each
    batch's already-computed log — no extra pass over the data.

    Returns (log, stats_df) read from ``log_dir`` after draining with
    Trigger.AvailableNow.
    """
    import os

    from pyspark.sql import functions as F

    from rehiver_spark.streaming.windows import (
        foreach_batch_collecting,
        read_file_stream,
    )

    sdf = read_file_stream(
        spark, src_dir, schema, fmt=fmt, max_files_per_trigger=max_files_per_trigger
    )
    base = src_dir.rstrip("/") + "/"
    cum = {"processed": 0, "total": 0, "matched": 0, "skipped_existing": 0}

    def handle(batch_df, batch_id):
        if cancel is not None and cancel.cancelled:
            # raising fails the query BEFORE this epoch commits: the
            # stream stops scheduling and the batch stays replayable
            raise PipelineCancelled(f"cancelled before batch {batch_id}")
        files = batch_df.select(
            F.input_file_name().alias("uri")
        ).distinct().select(
            F.regexp_replace(F.replace("uri", F.lit("file://"), F.lit("")), f"^{base}", "").alias("key")
        )
        matched = find_matching(files, patterns)
        log = process_matching(matched, processor)
        if on_progress is not None:
            log = log.persist()
        log.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(log_dir)
        if on_progress is not None:
            r = pipeline_stats_df(log).first()
            log.unpersist()
            cum["processed"] += r["processed"] + r["skipped"]
            cum["total"] += r["matched"]
            cum["matched"] += r["matched"]
            cum["skipped_existing"] += r["skipped_existing"]
            on_progress({**cum, "batch_id": batch_id})

    try:
        foreach_batch_collecting(
            sdf, handle, checkpoint=checkpoint, timeout_sec=timeout_sec
        )
    except Exception as e:
        if cancel is None or not cancel.cancelled or not _is_cancel_failure(e, cancel):
            # NOT our cancellation: a processor bug or I/O error that
            # happens to race a cancel() must still surface — only a
            # failure provably caused by the cancel path is absorbed
            raise
        # cancelled: the failing epoch never committed, so everything
        # below reads exactly the batches that completed — the partial
        # stats the reference returns on abort
    if not os.path.isdir(log_dir):  # no file ever matched any batch
        log = spark.createDataFrame(
            [], "key string, status string, error string, result string, batch_id long"
        )
    else:
        log = spark.read.parquet(log_dir)
    return log, pipeline_stats_df(log)
