"""Structured Streaming surface (SURVEY §2 C17).

Windows/watermarks/session aggregation and batch-replayable runners
live in ``windows``; the custom stateful operator
(``applyInPandasWithState``) in ``stateful``.
"""

from rehiver_spark.streaming.stateful import running_totals_stateful
from rehiver_spark.streaming.windows import (
    dedup_within_watermark,
    foreach_batch_collecting,
    read_file_stream,
    run_available_now,
    session_counts,
    sliding_counts,
    tumbling_counts,
    with_watermark,
)

__all__ = [
    "dedup_within_watermark",
    "foreach_batch_collecting",
    "read_file_stream",
    "run_available_now",
    "running_totals_stateful",
    "session_counts",
    "sliding_counts",
    "tumbling_counts",
    "with_watermark",
]
