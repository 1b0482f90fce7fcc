"""Declared query set (SURVEY §2 Part B) with DuckDB oracle twins.

Every operator the engine claims is registered here as a
``(spark_query, oracle_sql)`` pair; the driver harness runs both at
sf0.01 and hash-compares canonicalized results (CORRECTNESS gate).
Registration happens at import via the ``@query`` decorator in each
group module:

- ``x_ops``  — charter extensions X1–X27 (+ multimodal)
- ``e_ops``  — scale-path extensions X28–X40 + C18b + C17g
- ``r_ops``  — reference-surface operators R1–R17
- ``c_ops``  — relational core C1–C18

Registry ORDER (which decides the driver's 50-query correctness
window) is set explicitly by :func:`load_all` after all imports —
see the rotation note there.

Conventions (FIXTURES.md determinism rules):
- every aggregate/computed column is aliased IDENTICALLY in Spark and
  SQL; the harness sorts columns by name before hashing;
- DOUBLE outputs are ``round(x, 6)`` (or 2 for money) on BOTH sides;
- timestamps are emitted as formatted strings, never raw;
- int-ish outputs are cast to BIGINT on both sides (Spark ``year()``
  is INT, DuckDB's is BIGINT — never leave that to chance);
- approximate operators register with ``oracle=None`` → the driver
  records a weaker rows-only check (SURVEY §2 X6 rule).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a declared query (and its DuckDB twin when exact)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# The driver's correctness harness records only the FIRST 50 entries
# of the registry, so the front of the dict is a scarce resource the
# rounds rotate deliberately.
#
# STANDING ROTATION POLICY (adopted round 7, per the r6 verdict):
#   1. every query gets a driver row at least every 3 rounds — a name
#      whose newest driver row is 3 rounds old MUST enter the next
#      window;
#   2. queries materially touched in a round (operator code or query
#      body changed) always enter the NEXT round's window;
#   3. brand-new queries enter the window of the round that adds them;
#   4. remaining slots fill with the oldest-evidence names first.
#
# Round-11 window under that policy (history: r2-r3 recorded r/c; r4
# rotated x/e in; r5 rotated the 44 displaced r/c back + x40 + 5
# touched; r6 recorded the 19 never-recorded r5 additions + x57b + 30
# r4-stale; r7 recorded the 15 r4-stale + x22b + 2 touched + 6
# streaming + 4 mm_* + 18 r + c1-c4; r8 recorded the 19 committed
# r5-stale + x25 + x57c + 5 touched + 26 r6-row holders; r9 recorded
# the committed 21 sketch/stream/BPE names + 6 touched + mm_* + the
# full r-surface; r10 recorded its committed 20 + 7 touched + the
# c5-c18 block + x1-x5 + x10/x11):
#   - the committed 24 (pre-declared in round 10 as _R11_COMMITTED):
#     the r8-row holders whose evidence turns 3 rounds old here
#     (rule 1) — FIRST;
#   - new this round (rule 3): c17d2_stream_join_linear (the linear
#     key-regime twin of c17d);
#   - touched this round (rule 2): x17 + x29 (connected_components
#     NULL-id filter + byte-aware driver cap, r10 advice), x9 + x9p
#     (expr-path histogram unpersist, r10 advice), x8 (the r10
#     hamming-budget pre-filter 51ffc7d landed after the r10 window
#     was recorded, plus any r11 simhash tuning);
#   - 20 of the r9-row holders (rule 4 — oldest evidence first,
#     families contiguous): x21f/x37/x38, x22b, and the full
#     x41-x57 sketch/stream/BPE-stats block.
# OUTSIDE the window and why that is safe: every name not listed has
# an r9 or r10 driver row on code untouched since — the r10 window's
# c-block/x1-x5/x10/x11/x6-x8/x14/x18/x22/x30/x34/x35/x46/x46b/
# mm_decode hold fresh r10 rows; the mm_* trio and the r-surface hold
# r9 rows and are the committed r12 window under rule 1.
_R12_COMMITTED = (
    "mm_resize", "mm_features", "mm_frame_plan",
    "r1_glob_match", "r2_glob_filter", "r3_path_capture",
    "r4_partition_parse", "r5_partition_format", "r6_partition_prune",
    "r7_missing_keys", "r8_time_partition_path", "r8b_time_path_tz",
    "r9_time_range_paths", "r10_detect_changes", "r11_changes_filter",
    "r12_snapshot_commit", "r13_s3key_codec", "r14_valid_bucket_name",
    "r15_content_type", "r16_object_catalog", "r17_stream_process",
)
_DRIVER_WINDOW = (
    # the committed r11 window (rule 1: r8 rows turned 3 rounds old;
    # pre-declared last round as _R11_COMMITTED) — FIRST
    "x6c_portable_sample",
    "x7p_minhash_lsh",
    "x8p_simhash",
    "x12_redact_pii",
    "x13_stratified_sample",
    "x15_contamination",
    "x16_repetition",
    "x19_pipeline",
    "x20_training_mix",
    "x21_winnow_contamination",
    "x23_span_dedup",
    "x24_url_dedup",
    "x25_charlm_quality",
    "x26_quantize_int8",
    "x27_line_dedup",
    "x28_incremental_dedup",
    "x31_semantic_decontamination",
    "x32_corpus_report",
    "x33_quality_select",
    "x36_vocab_topk",
    "x39_hybrid_search",
    "x40_source_overlap",
    "x57b_substring_dedup_pruned",
    "x57c_substring_dedup_auto",
    # new this round (rule 3)
    "c17d2_stream_join_linear",
    # touched this round (rule 2)
    "x17_dedup_clusters",
    "x29_fuzzy_dedup",
    "x9_lsh_cosine_neardup",
    "x9p_lsh_cosine",
    "x8_simhash_pairs",
    # r9-row holders, oldest evidence first (rule 4)
    "x21f_winnow_fast",
    "x37_chunk_reassembly",
    "x38_corpus_drift",
    "x22b_semdedup_scaled",
    "x41_count_min",
    "x42_hll_distinct",
    "x43_bloom_dedup",
    "x44_stream_hll",
    "x45_bpe_pairs",
    "x47_hdr_quantiles",
    "x48_weighted_sample",
    "x49_dsir_scores",
    "x50_jl_project",
    "x51_kmeans",
    "x52_stream_cm",
    "x53_ann_recall",
    "x54_pipeline_yield",
    "x55_sketch_filter",
    "x56_stream_hdr",
    "x57_substring_dedup",
)


def load_all() -> None:
    """Import all group modules (idempotent), then order the registry.

    Import order alone does not control the driver window: after the
    imports, the registry is reordered to the explicit 50-name
    ``_DRIVER_WINDOW`` (round-11 rotation under the standing policy —
    see the note above), with everything else after in import order.
    Every query outside the window keeps its r9/r10 driver row on
    untouched code (the leftover r9-row holders are the committed r12
    window), and all are re-verified locally by tools/check_oracle.py
    (the identical gate). Do not change ``_DRIVER_WINDOW`` without
    checking driver-window coverage (tests/test_engine.py pins it).
    """
    from rehiver_spark.queries import x_ops  # noqa: F401  (isort: skip)
    from rehiver_spark.queries import e_ops  # noqa: F401  (X28-X57 + c18b + c17g)
    from rehiver_spark.queries import r_ops  # noqa: F401
    from rehiver_spark.queries import c_ops  # noqa: F401

    missing = [n for n in _DRIVER_WINDOW if n not in QUERIES]
    if missing:  # fail loudly: a silent miss shrinks the driver window
        raise RuntimeError(f"driver window names not registered: {missing}")
    rest = [n for n in QUERIES if n not in set(_DRIVER_WINDOW)]
    reordered = {n: QUERIES[n] for n in [*_DRIVER_WINDOW, *rest]}
    QUERIES.clear()
    QUERIES.update(reordered)


def scratch_dir(name: str, sf_dir: str) -> str:
    """Deterministic per-(query, sf_dir) scratch directory, CLEARED and
    recreated on each call. Queries that stage data on disk (streaming
    file sources, z-order layouts, snapshot stores) previously leaked a
    fresh ``mkdtemp`` per invocation — at sf1 that is hundreds of MB
    per bench run. One reused dir bounds scratch disk at a single copy
    per query, and clearing it keeps streaming checkpoints fresh (a
    reused checkpoint would make an AvailableNow re-run emit nothing).
    """
    import hashlib
    import os
    import shutil
    import tempfile

    # Layout: <tmp>/rehiver_scratch/<pid>/<query>_<sftag>. The PID
    # level keeps two concurrent processes benching the same
    # query+sf_dir from rmtree'ing each other's live streaming
    # checkpoints; the dead-PID sweep below keeps repeated runs from
    # accumulating orphaned scratch (each run is a fresh PID, so
    # without the sweep every bench/pytest invocation would leave its
    # z-order layouts and stream-source copies in /tmp forever).
    # per-UID base: a shared /tmp/rehiver_scratch owned by another OS
    # user would make our makedirs fail with PermissionError (sticky
    # /tmp lets anyone create toplevel dirs, not write into others')
    base = os.path.join(
        tempfile.gettempdir(), f"rehiver_scratch_u{os.getuid()}"
    )
    os.makedirs(base, exist_ok=True)
    for entry in os.listdir(base):
        if not entry.isdigit():
            continue
        try:
            os.kill(int(entry), 0)  # signal 0: existence probe only
        except ProcessLookupError:
            shutil.rmtree(os.path.join(base, entry), ignore_errors=True)
        except PermissionError:
            pass  # alive, owned by someone else
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    d = os.path.join(base, str(os.getpid()), f"{name}_{tag}")
    if os.path.isdir(d):
        shutil.rmtree(d)
    os.makedirs(d)
    return d


def tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None):
    """Load testdata views with a pinned UTC session timezone so
    date rendering matches DuckDB's naive timestamps regardless of how
    the caller's session was configured."""
    from rehiver_spark.session import load_tables

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return load_tables(spark, sf_dir, names)
