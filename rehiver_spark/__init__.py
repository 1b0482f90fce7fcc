"""pyrehiver — PySpark-native data-lake analytics engine.

Public API (see README.md for the module map; everything re-exported
here is stable surface a reference user would reach for):

    from rehiver_spark import Engine, get_spark
    from rehiver_spark import glob_match, PartitionSchema, TimePartitioner
"""

from rehiver_spark.engine import Engine
from rehiver_spark.functions.globs import (
    PathMatcher,
    match_exact,
    glob_all,
    glob_match,
    glob_to_regex,
    path_capture,
    segment_glob_match,
)
from rehiver_spark.operators.changes import (
    ChangeDetector,
    SnapshotStore,
    detect_changes,
    filter_changes,
)
from rehiver_spark.operators.dedup import (
    compact_dedup_index,
    connected_components,
    containment_pairs,
    dedup_index,
    exact_dedup,
    fuzzy_dedup,
    incremental_exact_dedup,
    incremental_minhash_neardup,
    index_update,
    minhash_index,
    jaccard_pairs,
    minhash_neardup_pairs,
    shingles,
    simhash_neardup_pairs,
    simhash_signatures,
    stream_incremental_dedup,
)
from rehiver_spark.operators.partitions import (
    PartitionField,
    PartitionSchema,
    analytics_schema,
    date_schema,
    log_schema,
)
from rehiver_spark.operators.pipeline import (
    find_matching,
    process_matching,
    stream_process,
    stream_process_incremental,
)
from rehiver_spark.operators.skew import salted_join
from rehiver_spark.operators.textops import corpus_report, pack_sequences, quality_select, repetition_stats, text_stats, tf_idf, training_mix_sample, word_ngrams
from rehiver_spark.operators.timeparts import TimePartitioner
from rehiver_spark.operators.vectorops import (
    cosine_topk,
    ivf_topk,
    lsh_cosine_neardup,
    semantic_contamination_pairs,
)
from rehiver_spark.session import ensure_parallelism, get_spark, read_events
from rehiver_spark.sources.catalog import (
    from_file_scan,
    list_distributed,
    list_local,
    local_lister_factory,
    s3_lister_factory,
)
from rehiver_spark.sources.reader import read_documents, read_matching, read_path_glob
from rehiver_spark.sources.writer import (
    put_object,
    put_objects_df,
    write_partitioned,
    write_zordered,
)

__version__ = "0.2.0"

__all__ = [
    "ChangeDetector",
    "Engine",
    "PartitionField",
    "PartitionSchema",
    "PathMatcher",
    "match_exact",
    "SnapshotStore",
    "TimePartitioner",
    "analytics_schema",
    "compact_dedup_index",
    "corpus_report",
    "cosine_topk",
    "date_schema",
    "dedup_index",
    "detect_changes",
    "ensure_parallelism",
    "fuzzy_dedup",
    "incremental_exact_dedup",
    "incremental_minhash_neardup",
    "index_update",
    "connected_components",
    "containment_pairs",
    "exact_dedup",
    "filter_changes",
    "find_matching",
    "from_file_scan",
    "get_spark",
    "glob_all",
    "glob_match",
    "glob_to_regex",
    "ivf_topk",
    "jaccard_pairs",
    "list_distributed",
    "list_local",
    "local_lister_factory",
    "log_schema",
    "lsh_cosine_neardup",
    "minhash_index",
    "minhash_neardup_pairs",
    "path_capture",
    "process_matching",
    "put_object",
    "put_objects_df",
    "quality_select",
    "read_documents",
    "read_events",
    "read_matching",
    "read_path_glob",
    "s3_lister_factory",
    "salted_join",
    "segment_glob_match",
    "semantic_contamination_pairs",
    "shingles",
    "simhash_neardup_pairs",
    "simhash_signatures",
    "stream_incremental_dedup",
    "stream_process",
    "stream_process_incremental",
    "pack_sequences",
    "repetition_stats",
    "text_stats",
    "tf_idf",
    "training_mix_sample",
    "word_ngrams",
    "write_partitioned",
    "write_zordered",
]
