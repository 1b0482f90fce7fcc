"""Read path: glob-scoped scans (reference EP1 → Spark lifecycle,
SURVEY §3: "spark.read.option('pathGlobFilter', ...).load(paths) →
FileSourceScanExec with partition pruning").

Two mechanisms, picked by pattern shape:

- single-segment tail globs (``*.json``) → Spark's built-in
  ``pathGlobFilter`` read option (no listing needed, pruning native);
- full micromatch lists (globstar, negation, braces) → resolve the
  matching FILES driver-side with the compiled matcher, then
  ``.load(paths)`` so Spark opens ONLY matching files. This is the
  partition-pruning analog for non-hive layouts: the driver handles
  paths (cheap metadata), executors never see non-matching files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from rehiver_spark.functions.globs import PathMatcher


def resolve_matching_paths(
    base: str, patterns: str | list[str], dot: bool = False, nocase: bool = False
) -> list[str]:
    """Relative file paths under ``base`` matching the pattern list
    (driver-side; metadata only, never file contents)."""
    matcher = PathMatcher(dot=dot, nocase=nocase)
    rels = []
    for dirpath, _, files in os.walk(base):
        for fn in files:
            if fn.startswith(("_", ".")):  # Spark metadata/hidden files
                continue
            rels.append(os.path.relpath(os.path.join(dirpath, fn), base).replace(os.sep, "/"))
    return matcher.match(sorted(rels), patterns)


def read_matching(
    spark: SparkSession,
    base: str,
    patterns: str | list[str],
    fmt: str = "parquet",
    dot: bool = False,
    nocase: bool = False,
    base_path: bool = True,
) -> DataFrame:
    """Load only the files under ``base`` whose relative path matches
    the micromatch pattern list. With ``base_path=True`` hive partition
    columns embedded in matched paths are still inferred (Spark's
    ``basePath`` option)."""
    rels = resolve_matching_paths(base, patterns, dot=dot, nocase=nocase)
    if not rels:
        raise FileNotFoundError(f"no files under {base} match {patterns}")
    r = spark.read.format(fmt)
    if base_path:
        r = r.option("basePath", base)
    return r.load([os.path.join(base, p) for p in rels])


def read_path_glob(
    spark: SparkSession, base: str, tail_glob: str, fmt: str = "parquet"
) -> DataFrame:
    """Built-in ``pathGlobFilter`` fast path for single-segment globs
    (applies to file NAMES only, per Spark semantics)."""
    return spark.read.format(fmt).option("pathGlobFilter", tail_glob).load(base)


DOCUMENT_FORMATS = ("parquet", "jsonl", "json", "csv", "text")


def read_documents(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Ingest a document corpus from any of the formats a training-data
    pipeline actually receives — parquet, JSONL (the lingua franca of
    web-scale text drops; ``.jsonl``/``.jsonl.gz``/``.json``), CSV with
    a header, or one-document-per-file raw text — normalized to the
    engine's documents shape::

        doc_id BIGINT, text STRING, source STRING, n_chars BIGINT

    ``fmt`` is inferred from the path's extension when omitted
    (compressed extensions like ``.jsonl.gz`` are handled; Spark
    decompresses transparently). Columns beyond the normalized four are
    preserved. When the input carries no ``doc_id``, a deterministic
    content-addressed id is synthesized (``xxhash64(source, text)``) —
    stable across re-reads and partition layouts, which is what
    downstream incremental dedup needs; colliding (source, text) pairs
    are exact duplicates by construction and collapse to one id.

    Scale: every format maps to Spark's native distributed readers —
    no driver-side parsing; raw-text mode uses ``wholetext`` with the
    ``_metadata`` file path, so a million files become a million
    ordinary scan splits.
    """
    from pyspark.sql import functions as F

    if fmt is None:
        stripped = path.rstrip("/").removesuffix(".gz").removesuffix(".zst")
        ext = os.path.splitext(stripped)[1].lstrip(".").lower()
        fmt = {
            "jsonl": "jsonl", "json": "jsonl", "ndjson": "jsonl",
            "csv": "csv", "txt": "text", "parquet": "parquet",
        }.get(ext, "parquet")
    if fmt not in DOCUMENT_FORMATS:
        raise ValueError(f"unsupported document format {fmt!r}; one of {DOCUMENT_FORMATS}")

    if fmt == "parquet":
        df = spark.read.parquet(path)
    elif fmt in ("jsonl", "json"):
        df = spark.read.json(path)
    elif fmt == "csv":
        df = spark.read.option("header", True).option("inferSchema", True).csv(path)
    else:  # text: one document per file
        df = (
            spark.read.option("wholetext", True)
            .text(path)
            .select(
                F.col("value").alias(text_col),
                F.col("_metadata.file_path").alias("source"),
            )
        )

    if text_col not in df.columns:
        raise ValueError(f"ingested data has no {text_col!r} column: {df.columns}")
    if "source" not in df.columns:
        df = df.withColumn("source", F.lit(path))
    if id_col not in df.columns:
        df = df.withColumn(id_col, F.xxhash64("source", text_col))
    df = df.withColumn(id_col, F.col(id_col).cast("bigint"))
    if "n_chars" not in df.columns:
        df = df.withColumn("n_chars", F.length(text_col).cast("bigint"))
    front = [id_col, text_col, "source", "n_chars"]
    return df.select(*front, *[c for c in df.columns if c not in front])
