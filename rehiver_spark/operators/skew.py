"""Skew mitigation: salted joins for pathological key distributions.

``salted_join`` replicates the SMALL side ``salt`` times and scatters
the large side across the replicas with a deterministic hash, so the
hot key's rows spread over ``salt`` tasks. Results are identical to
the unsalted join (verified in tests); cost is small-side × salt.

WHEN to use what (measured round 7, BASELINE.md — 6M-row fact with a
single key holding 60% of rows, SMJ against a 1k dim, AQE skew split
verified firing via ``SortMergeJoin(skew=true)`` in the final plan):

1. **Broadcast first.** If the small side fits the broadcast
   threshold, there is no shuffle and key skew is moot (0.24 s vs
   1.88 s unmitigated in the fixture).
2. **Then AQE's skew-join** (on by default in ``session.get_spark``).
   It beat explicit salting on the exact single-hot-key scenario this
   module was written for (0.79 s vs 1.12–1.24 s): AQE splits only
   the oversized partition and replicates only the MATCHING
   small-side partition, where salting replicates the whole small
   side ``salt``× and re-hashes every large-side row. Mind the
   trigger conditions: post-shuffle SMJ only, partition >
   ``skewedPartitionThresholdInBytes`` (256MB default) AND >
   ``skewedPartitionFactor``× the median — at small scale lower the
   thresholds or it silently never fires.
3. **Explicit salting** (this operator) for what AQE skew-join does
   NOT cover: skewed AGGREGATIONS (AQE splits join partitions only —
   pre-aggregate on (key, salt) then re-aggregate), paths with AQE
   disabled, and stream-static joins (no AQE re-plan inside a
   micro-batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join with the large side salted and the small side
    replicated. ``how`` ∈ {inner, left} (left = large side preserved).

    The salt is a deterministic hash of the large side's full row (not
    rand(): task retries must re-produce the same scatter), so the same
    key's rows land on all ``salt`` replicas uniformly.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how in {'inner','left'}")
    lcols = [c for c in large.columns]
    l = large.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in lcols]), F.lit(salt))
    )
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l.join(s, [*on, "_salt"], how)
    return out.drop("_salt")
