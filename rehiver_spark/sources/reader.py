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
