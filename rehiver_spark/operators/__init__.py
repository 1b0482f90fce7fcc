"""Operator library: partitions, time paths, change detection, the
processing pipeline, dedup/similarity/text/multimodal extensions, and
skew-handling joins. Deep imports (rehiver_spark.operators.dedup, ...)
remain the canonical paths; this surface re-exports the workhorses."""

from rehiver_spark.operators.changes import (
    ChangeDetector,
    SnapshotStore,
    detect_changes,
    filter_changes,
    normalize_s3_object,
)
from rehiver_spark.operators.dedup import (
    connected_components,
    containment_pairs,
    dedup_exact,
    exact_dedup,
    jaccard_pairs,
    minhash_neardup_pairs,
    shingles,
    simhash_neardup_pairs,
    simhash_signatures,
)
from rehiver_spark.operators.multimodal import (
    decode_media,
    extract_features,
    frame_sample_plan,
    media_from_documents,
)
from rehiver_spark.operators.partitions import (
    PartitionField,
    PartitionParseError,
    PartitionSchema,
    analytics_schema,
    date_schema,
    log_schema,
)
from rehiver_spark.operators.pipeline import (
    PipelineStats,
    find_matching,
    pipeline_stats,
    pipeline_stats_df,
    process_matching,
    stream_process,
    stream_process_incremental,
)
from rehiver_spark.operators.skew import salted_join
from rehiver_spark.operators.textops import (
    chunk_documents,
    pack_sequences,
    redact_pii,
    repetition_stats,
    stratified_sample,
    text_stats,
    tf_idf,
    tokens,
    training_mix_sample,
    winnow_fingerprints,
    word_ngrams,
)
from rehiver_spark.operators.timeparts import TimePartitioner
from rehiver_spark.operators.vectorops import (
    cosine_topk,
    ivf_topk,
    lsh_cosine_neardup,
    lsh_cosine_neardup_portable,
)

__all__ = [
    "ChangeDetector",
    "PartitionField",
    "PartitionParseError",
    "PartitionSchema",
    "PipelineStats",
    "SnapshotStore",
    "TimePartitioner",
    "analytics_schema",
    "chunk_documents",
    "connected_components",
    "containment_pairs",
    "cosine_topk",
    "date_schema",
    "decode_media",
    "dedup_exact",
    "detect_changes",
    "exact_dedup",
    "extract_features",
    "filter_changes",
    "find_matching",
    "frame_sample_plan",
    "ivf_topk",
    "jaccard_pairs",
    "log_schema",
    "lsh_cosine_neardup",
    "lsh_cosine_neardup_portable",
    "media_from_documents",
    "minhash_neardup_pairs",
    "normalize_s3_object",
    "pack_sequences",
    "pipeline_stats",
    "pipeline_stats_df",
    "process_matching",
    "redact_pii",
    "repetition_stats",
    "salted_join",
    "shingles",
    "simhash_neardup_pairs",
    "simhash_signatures",
    "stratified_sample",
    "stream_process",
    "stream_process_incremental",
    "text_stats",
    "tf_idf",
    "tokens",
    "training_mix_sample",
    "winnow_fingerprints",
    "word_ngrams",
]
