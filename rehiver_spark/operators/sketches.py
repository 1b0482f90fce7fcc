"""Mergeable frequency/cardinality sketches: Count-Min and HyperLogLog.

Charter extensions X41/X42 — the two workhorse sketches of large-scale
corpus accounting (Cormode & Muthukrishnan 2005; Flajolet et al. 2007).
At 100 TB you cannot afford an exact (token → count) relation per
monitoring tick, and ``approx_count_distinct`` (x6) is JVM-opaque.
These implementations are **portable**: every hash is the md5-derived
60-bit integer from functions/hashing.py, so a SQL engine reproduces
the SKETCH ITSELF bit-identically — the estimates become oracle-
checkable, not rows-only.

Design for scale — both sketches are relations, not driver objects:

- ``cm_sketch``: (depth d × width w) counters as a (row, bucket, cnt)
  relation — ONE explode + ONE groupBy count (partial-combined
  map-side; shuffle cardinality is capped at d·w regardless of input).
  Sketches merge by summing counters: union + re-aggregate. Point
  queries join the items against the sketch (d rows each) and take the
  min — the classic CM overestimate guarantee: true ≤ est ≤ true + εN.
- ``hll_registers``: 2^p max-of-rho registers via ONE groupBy max —
  shuffle cardinality capped at 2^p. Merge = union + max. The estimate
  uses EXACT integer arithmetic for the harmonic sum (each 2^(-rho)
  term is scaled by 2^K into an exact BIGINT, summed as DECIMAL(38,0),
  divided ONCE at the end) so the result is bit-stable at any
  parallelism and reproducible in SQL.

Neither touches Python rows; everything is Column expressions inside
whole-stage codegen.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rehiver_spark.functions.hashing import md5_hash60, md5_hash60_sql

# ---------------------------------------------------------------------------
# X41 — Count-Min sketch
# ---------------------------------------------------------------------------


def _cm_bucket(col: Column, row: int, width: int) -> Column:
    """Row-i bucket of an item: md5-derived, portable."""
    return F.pmod(md5_hash60(F.concat(F.lit(f"cm{row}:"), col)), F.lit(width))


def cm_bucket_sql(expr: str, row: int, width: int) -> str:
    """DuckDB twin of :func:`_cm_bucket` (pmod of a non-negative hash
    is plain ``%`` — the 60-bit hash is always ≥ 0)."""
    salted = f"'cm{row}:' || {expr}"
    return f"({md5_hash60_sql(salted)} % {width})"


def cm_sketch(
    items: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch of an item relation → (row, bucket, cnt).

    One row per (depth-row, bucket) pair that received at least one
    item — at most d·w rows total, independent of input size (absent
    buckets are implicitly 0). ``weight_col`` aggregates weighted
    frequencies (e.g. token counts per doc) instead of row counts.
    """
    if depth <= 0 or width <= 0:
        raise ValueError(f"depth/width must be positive, got {depth}x{width}")
    c = F.col(item_col)
    w = F.col(weight_col).cast("bigint") if weight_col else F.lit(1).cast("bigint")
    rows = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _cm_bucket(c, i, width).alias("bucket"),
                        w.alias("w"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("e")
    )
    return rows.groupBy(
        F.col("e.row").alias("row"), F.col("e.bucket").alias("bucket")
    ).agg(F.sum("e.w").alias("cnt"))


def cm_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (depth, width): counters add."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cm_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates: min over the d counters of each item.

    The query relation is exploded to d (row, bucket) probes and joined
    against the sketch — the sketch side is at most d·w rows, so
    Catalyst broadcasts it; the query side never shuffles. Items whose
    buckets are all absent estimate 0 (coalesce).
    """
    c = F.col(item_col)
    probes = queries.select(
        item_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _cm_bucket(c, i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("p"),
    ).select(item_col, F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return joined.groupBy(item_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias("est")
    )


# ---------------------------------------------------------------------------
# X42 — HyperLogLog (portable, exact-arithmetic estimator)
# ---------------------------------------------------------------------------

_HLL_BITS = 60  # md5_hash60 width


def _hll_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_registers(
    items: DataFrame,
    item_col: str = "item",
    p: int = 9,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """HLL registers: (group…, idx, rho) with rho = max leading-zero
    rank in the register's hash suffix. ONE aggregation, ≤ 2^p rows per
    group. Merge across sketches = union + max over (group, idx).

    rho extraction avoids float log2 entirely: the suffix is rendered
    with ``bin()`` and left-padded to its full 60-p bits; the position
    of the first '1' IS the leading-zero count + 1, and an all-zero
    suffix maps to (60-p)+1 — integer/string ops only, so Spark and any
    SQL oracle agree bit-for-bit.
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4,16], got {p}")
    h = md5_hash60(F.col(item_col).cast("string"))
    suffix_bits = _HLL_BITS - p
    idx = F.shiftright(h, suffix_bits)
    suffix = h.bitwiseAND(F.lit((1 << suffix_bits) - 1))
    rho = F.when(suffix == 0, F.lit(suffix_bits + 1)).otherwise(
        F.instr(F.lpad(F.bin(suffix), suffix_bits, "0"), "1")
    )
    g = list(group_cols or [])
    return (
        items.select(*g, idx.alias("idx"), rho.cast("int").alias("rho"))
        .groupBy(*g, "idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_registers_sql(expr: str, p: int, from_clause: str, group_cols: str = "") -> str:
    """DuckDB twin of :func:`hll_registers` (same idx/rho math)."""
    suffix_bits = _HLL_BITS - p
    h = md5_hash60_sql(expr)
    sel_g = f"{group_cols}, " if group_cols else ""
    grp_g = f"{group_cols}, " if group_cols else ""
    return f"""
      SELECT {sel_g}h // {1 << suffix_bits} AS idx,
        max(CASE WHEN (h % {1 << suffix_bits}) = 0 THEN {suffix_bits + 1}
            ELSE position('1' IN lpad(bin(h % {1 << suffix_bits}), {suffix_bits}, '0'))
            END) AS rho
      FROM (SELECT {sel_g}{h} AS h {from_clause})
      GROUP BY {grp_g}idx
    """


def hll_estimate(
    registers: DataFrame, p: int = 9, group_cols: list[str] | None = None
) -> DataFrame:
    """Cardinality estimate from a register relation, bit-stable.

    The raw-estimate harmonic sum Σ 2^(-rho) is computed EXACTLY: each
    term is scaled to the integer 2^(K - rho) with K = max rho = 61-p
    (so every term is a non-negative integer ≤ 2^K), summed in
    DECIMAL(38,0) (order-independent), and the single final division
    produces the only float. Empty registers contribute 2^0 = 2^K/2^K
    each — added as (m - observed) · 2^K. Small-range linear counting
    (est ≤ 2.5m with empty registers) applies the standard correction.
    Output: (group…, est_distinct DOUBLE rounded to 4).
    """
    m = 1 << p
    k = (_HLL_BITS - p) + 1  # max possible rho
    alpha = _hll_alpha(m)
    g = list(group_cols or [])
    agg = registers.groupBy(*g).agg(
        F.sum(F.pow(F.lit(2.0), F.lit(k) - F.col("rho")).cast("decimal(38,0)"))
        .alias("s_obs"),
        F.count("*").alias("n_obs"),
    )
    # Σ 2^-rho = (s_obs + (m - n_obs)·2^k) / 2^k ; raw = α·m² / Σ
    denom = (F.col("s_obs") + (F.lit(m) - F.col("n_obs")) * F.lit(2**k)).cast(
        "double"
    )
    raw = F.lit(alpha * m * m * float(2**k)) / denom
    zeros = F.lit(m) - F.col("n_obs")
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(*g, F.round(est, 4).alias("est_distinct"))


def hll_merge(*register_sets: DataFrame) -> DataFrame:
    """Merge register relations (same p): elementwise max."""
    out = register_sets[0]
    for r in register_sets[1:]:
        out = out.unionByName(r)
    keys = [c for c in out.columns if c != "rho"]
    return out.groupBy(*keys).agg(F.max("rho").alias("rho"))


def hll_error_bound(p: int) -> float:
    """Standard error of HLL at precision p: 1.04 / sqrt(2^p)."""
    return 1.04 / math.sqrt(1 << p)


# ---------------------------------------------------------------------------
# X47 — HDR-histogram quantile sketch (integer-exact log-bucketing)
# ---------------------------------------------------------------------------
#
# The quantile member of the mergeable-sketch family (with CM for
# frequency and HLL for cardinality): distribution monitoring of
# non-negative integer measures (doc lengths, token counts, file
# sizes) in a fixed-size relation. The bucketing is HdrHistogram's
# (Tene; same family as DDSketch, Masson et al. VLDB 2019) but
# computed ENTIRELY in integer arithmetic — floor(log2 v) comes from
# the binary-string length, the sub-bucket from an integer shift — so
# there is no libm ln() whose last-ulp rounding could flip a boundary
# bucket between engines: the sketch AND the quantile estimates are
# bit-identical in SQL, not merely close.
#
# bucket(v) for v > 0, with S sub-buckets per octave (S a power of 2):
#   e = floor(log2 v) = length(bin(v)) - 1
#   m = (v * S) >> e  - S          (integer in [0, S))
#   id = e * S + m
# v == 0 → reserved bucket -1. Relative half-width of bucket (e, m) is
# 1/(2S + 2m + 1) ≤ 1/(2S+1) (~3% at S=16). Merge = union + sum.
# Estimates use the bucket midpoint 2^e · (2S + 2m + 1) / (2S),
# computed from integers with one final division.


def hdr_bucket(col: Column, sub: int = 16) -> Column:
    """Bit-exact HDR bucket id of a non-negative BIGINT column
    (0 → -1; negatives → -2; ≥ 2^49 → -3 — each visible rather than
    silently folded). ``(v·S) / 2^e`` is computed in doubles, which is
    EXACT here: v·S < 2^53 stays representable and division by a power
    of two only decrements the exponent — so the floor equals the
    integer shift the SQL twin uses, on every input in the domain
    (property-tested across octave boundaries)."""
    v = col.cast("bigint")
    e = (F.length(F.bin(v)) - 1).cast("int")
    p2 = F.pow(F.lit(2.0), e.cast("double"))
    m = F.floor((v * sub).cast("double") / p2).cast("bigint") - sub
    bid = e.cast("bigint") * sub + m
    return (
        F.when(v < 0, F.lit(-2))
        .when(v == 0, F.lit(-1))
        .when(v >= F.lit(1 << 49), F.lit(-3))
        .otherwise(bid)
    )


def hdr_bucket_sql(expr: str, sub: int = 16) -> str:
    """DuckDB twin of :func:`hdr_bucket` (bin() is minimal-width in
    both engines; >> is arithmetic shift on BIGINT in both)."""
    v = f"CAST({expr} AS BIGINT)"
    e = f"(length(bin({v})) - 1)"
    m = f"(({v} * {sub}) >> {e}) - {sub}"
    # the v >= 2^49 guard must match the Spark side: without it the
    # twin computes a real bucket id for values Spark diagnoses as -3
    # (and v*sub can overflow the shift math) — r5 advisor finding
    return (
        f"CASE WHEN {v} < 0 THEN -2 WHEN {v} = 0 THEN -1 "
        f"WHEN {v} >= {1 << 49} THEN -3 "
        f"ELSE CAST({e} AS BIGINT) * {sub} + {m} END"
    )


def hdr_sketch(
    df: DataFrame,
    value_col: str,
    sub: int = 16,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """(group…, bucket, cnt) — ONE partial-combined groupBy; shuffle
    cardinality capped at |groups| · S·64 buckets regardless of input."""
    if sub & (sub - 1) or sub <= 0:
        raise ValueError(f"sub must be a power of two, got {sub}")
    g = group_cols or []
    return (
        df.select(*g, hdr_bucket(F.col(value_col), sub).alias("bucket"))
        .groupBy(*g, "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def hdr_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches (same sub): union + sum."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "cnt"]
    return out.groupBy(*keys).agg(F.sum("cnt").cast("bigint").alias("cnt"))


def hdr_bucket_mid(bucket: Column, sub: int = 16) -> Column:
    """Midpoint value of a bucket id (DOUBLE; exact integers until the
    one final division). Zero bucket → 0.0."""
    e = F.floor(bucket / sub).cast("bigint")
    m = F.pmod(bucket, F.lit(sub))
    # 2^e as an exact double (e ≤ 49 in-domain), times an exact small
    # integer, divided by a power of two: every step bit-exact
    num = F.pow(F.lit(2.0), e.cast("double")) * (2 * sub + 2 * m + 1)
    return F.when(bucket == -1, F.lit(0.0)).otherwise(
        num / F.lit(float(2 * sub))
    )


def hdr_quantiles(
    sketch: DataFrame,
    quantiles: list[tuple[int, int]],
    sub: int = 16,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Quantile estimates from a sketch relation.

    ``quantiles`` are exact rationals (num, den) — e.g. (1, 2) for the
    median — so the rank threshold ceil(q·n) is INTEGER arithmetic,
    never a float comparison that could disagree across engines. Per
    group: one window cumsum over the (tiny, ≤ S·64-row) sketch, then
    the first bucket whose cumulative count reaches the threshold.
    Output: (group…, q, est, rel_err_bound).

    Out-of-domain buckets (-2 negatives, -3 ≥ 2^49) are EXCLUDED from
    the quantile mass — they are diagnostic counts, not measures, and
    would otherwise sort below every real bucket, be selectable as a
    quantile bucket, and yield a midpoint that (a) is meaningless and
    (b) diverges between Spark's pmod and SQL's ``%`` on negatives.
    The zero bucket (-1) IS real mass (value 0) and stays in.
    """
    from pyspark.sql import Window

    if not quantiles:
        raise ValueError("quantiles must be a non-empty list of (num, den)")
    g = group_cols or []
    sketch = sketch.filter(F.col("bucket") >= -1)
    totals = sketch.groupBy(*g).agg(F.sum("cnt").alias("n"))
    cum = sketch.join(totals, g) if g else sketch.crossJoin(F.broadcast(totals))
    w = Window.partitionBy(*g).orderBy("bucket") if g else Window.orderBy("bucket")
    cum = cum.withColumn("cum", F.sum("cnt").over(w))
    qs = None
    for num, den in quantiles:
        if not (0 < num <= den):
            raise ValueError(f"quantile {num}/{den} out of (0, 1]")
        # cum >= ceil(n·num/den)  ⟺  cum·den >= n·num (all BIGINT —
        # no float rank threshold to disagree across engines)
        sel = (
            cum.filter(F.col("cum") * den >= F.col("n") * num)
            .groupBy(*g, "n")
            .agg(F.min("bucket").alias("bucket"))
            .select(
                *g,
                F.lit(f"{num}/{den}").alias("q"),
                F.round(hdr_bucket_mid(F.col("bucket"), sub), 6).alias("est"),
            )
        )
        qs = sel if qs is None else qs.unionByName(sel)
    return qs.withColumn(
        "rel_err_bound", F.round(F.lit(1.0 / (2 * sub + 1)), 6)
    )
