"""Column-level function library: glob compilation/matching and the
portable (engine-agnostic) hashing primitives."""

from rehiver_spark.functions.globs import (
    PathMatcher,
    capture_to_regex,
    expand_braces,
    glob_all,
    glob_match,
    glob_to_regex,
    match_exact,
    path_capture,
    segment_glob_match,
    segment_glob_to_regex,
    split_patterns,
)
from rehiver_spark.functions.hashing import (
    md5_hash60,
    md5_hash60_py,
    md5_hash60_sql,
    rademacher_planes,
)

__all__ = [
    "PathMatcher",
    "capture_to_regex",
    "expand_braces",
    "glob_all",
    "glob_match",
    "glob_to_regex",
    "match_exact",
    "md5_hash60",
    "md5_hash60_py",
    "md5_hash60_sql",
    "path_capture",
    "rademacher_planes",
    "segment_glob_match",
    "segment_glob_to_regex",
    "split_patterns",
]
