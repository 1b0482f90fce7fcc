"""Skew mitigation: salted joins for pathological key distributions.

AQE's skew-join splitting (on by default in ``session.get_spark``)
handles most skew at runtime; this operator is the explicit form for
cases AQE can't fix — e.g. a single key holding >50% of a 100 TB fact
table, where even a split partition floods one join side.

``salted_join`` replicates the SMALL side ``salt`` times and scatters
the large side across the replicas with a deterministic hash, so the
hot key's rows spread over ``salt`` tasks. Results are identical to
the unsalted join (verified in tests); cost is small-side × salt.
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
