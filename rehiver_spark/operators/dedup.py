"""Deduplication operators: exact, shingle-Jaccard, MinHash-LSH, SimHash.

Charter extension set (SURVEY §2 X1/X2) — dedup over document tables is
the workhorse of LLM training-data pipelines. Design rules for 100 TB:

- NEVER all-pairs. Exact Jaccard pairs come from a *blocking join* on
  shared shingles (a pair with J > 0 shares ≥1 shingle, so blocking on
  the shingle is lossless); |intersection| falls out of the join's
  group-by count, so the pair list is produced by ONE shuffle on
  shingle + ONE aggregation on (id_a, id_b).
- The approximate scale path (MinHash-LSH banding) only reduces the
  candidate set; candidates are always exact-verified, so returned
  pairs are a subset of the exact answer with tunable recall.
- Deterministic keeps: row_number over an explicit total order, never
  dropDuplicates (C16 rule).

All hashing is Spark's xxhash64 (JVM-side, seeded) — used only inside
approximate operators (MinHash/SimHash), never in oracle-checked exact
paths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from rehiver_spark.operators.textops import normalize_text, tokens


# ---------------------------------------------------------------------------
# X1 — exact dedup by normalized content hash
# ---------------------------------------------------------------------------


def content_hash(col: Column | str) -> Column:
    """sha256 hex of the normalized text — the exact-dedup key."""
    return F.sha2(normalize_text(col), 256)


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Mark exact duplicates: adds ``content_sha``, ``is_keeper`` (the
    minimum id per hash survives), ``dup_count`` (group size).

    Plan: one shuffle on the hash; window row_number + count over the
    same partitioning (single exchange reused for both window specs).
    """
    h = content_hash(F.col(text_col))
    w = Window.partitionBy("content_sha").orderBy(F.col(id_col).asc())
    wall = Window.partitionBy("content_sha")
    return (
        df.withColumn("content_sha", h)
        .withColumn("is_keeper", F.row_number().over(w) == 1)
        .withColumn("dup_count", F.count("*").over(wall))
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The deduplicated relation itself (keepers only)."""
    return exact_dedup(df, text_col, id_col).filter("is_keeper").drop(
        "is_keeper", "dup_count"
    )


# ---------------------------------------------------------------------------
# shingles + exact Jaccard pairs (X2 exact form)
# ---------------------------------------------------------------------------


def shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct word k-shingles of the normalized text.

    Documents shorter than k tokens contribute their whole token
    sequence as a single shingle (so no document is unshingled).
    """
    toks = tokens(col)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    shingle_col: str = "shingles",
    threshold: float = 0.8,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """EXACT above-threshold Jaccard pairs via a shingle-blocking join.

    Never forms a cartesian product: explode to (id, shingle), self-join
    on shingle with id_a < id_b, then |intersection| = COUNT(*) per
    pair and |union| = |A| + |B| - |intersection| from a broadcast of
    per-doc shingle counts.

    ``max_shingle_freq`` drops shingles shared by more than N docs
    before the join — the classic skew guard for 100 TB corpora (a
    stop-shingle appearing in 10M docs would create 10M² join rows).
    It makes the result approximate (documented); default off so the
    oracle-checked form stays exact.

    Output: id_a, id_b, n_common, n_a, n_b, jaccard — ordered by caller.
    """
    sized = df.select(
        F.col(id_col).alias("_id"), F.col(shingle_col).alias("_sh")
    ).withColumn("_n", F.size("_sh"))
    counts = sized.select("_id", "_n")
    ex = sized.select("_id", F.explode("_sh").alias("_s"))
    if max_shingle_freq is not None:
        hot = (
            ex.groupBy("_s").agg(F.count("*").alias("_f"))
            .filter(F.col("_f") > max_shingle_freq)
            .select("_s")
        )
        ex = ex.join(F.broadcast(hot), "_s", "left_anti")
    a = ex.select(F.col("_id").alias("id_a"), F.col("_s"))
    b = ex.select(F.col("_id").alias("id_b"), F.col("_s"))
    inter = (
        a.join(b, "_s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    out = (
        inter.join(F.broadcast(counts.withColumnsRenamed({"_id": "id_a", "_n": "n_a"})), "id_a")
        .join(F.broadcast(counts.withColumnsRenamed({"_id": "id_b", "_n": "n_b"})), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
    )
    return out.filter(F.col("jaccard") >= F.lit(threshold)).select(
        "id_a", "id_b", "n_common", "n_a", "n_b", "jaccard"
    )


# ---------------------------------------------------------------------------
# MinHash + LSH banding (X2 scale path; approximate candidate generation,
# exact verification)
# ---------------------------------------------------------------------------


def minhash_signature(shingle_col: Column | str, num_hashes: int = 32, seed: int = 42) -> Column:
    """ARRAY<BIGINT> MinHash signature: per hash function i, the minimum
    xxhash64(seed, i, shingle) over the shingle set. All JVM-side."""
    sh = F.col(shingle_col) if isinstance(shingle_col, str) else shingle_col

    # single-parameter lambda per hash fn: pyspark binds a lambda var per
    # Python parameter, so `lambda s, i=i` would bind i to the index var
    def hash_i(i: int):
        return lambda s: F.xxhash64(F.lit(seed), F.lit(i), s)

    mins = [F.array_min(F.transform(sh, hash_i(i))) for i in range(num_hashes)]
    return F.array(*mins)


def lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    shingle_col: str = "shingles",
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Candidate pairs whose MinHash signatures collide in ≥1 LSH band.

    bands=b over r=num_hashes/b rows → collision prob ≈ 1-(1-J^r)^b.
    Plan: explode to (band, band_hash) keys → self-join on the band
    bucket → distinct pairs. One shuffle on the bucket key; hot buckets
    are bounded by band width (r rows hashed together).
    """
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    r = num_hashes // bands
    sig = minhash_signature(shingle_col, num_hashes, seed)
    banded = df.select(F.col(id_col).alias("_id"), sig.alias("_sig")).select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(*[F.element_at(F.col("_sig"), bi * r + j + 1) for j in range(r)]).alias("bh"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("b"),
    ).select("_id", "b.band", "b.bh")
    a = banded.withColumnRenamed("_id", "id_a")
    b = banded.withColumnRenamed("_id", "id_b")
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
) -> DataFrame:
    """LSH-blocked, exact-verified near-dup pairs: generate candidates by
    MinHash banding, then compute TRUE Jaccard on candidates only and
    filter by threshold. Returned pairs ⊆ exact answer; recall governed
    by (num_hashes, bands) vs threshold. This is the 100 TB plan — the
    shingle-blocking join in ``jaccard_pairs`` touches every co-shingle
    pair, LSH touches only banding collisions.
    """
    sh = df.select(F.col(id_col).alias("_id"), shingles(F.col(text_col), k).alias("_sh"))
    cand = lsh_candidates(sh, "_id", "_sh", num_hashes, bands, seed)
    a = sh.withColumnsRenamed({"_id": "id_a", "_sh": "_sha"})
    b = sh.withColumnsRenamed({"_id": "id_b", "_sh": "_shb"})
    verified = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("n_common", F.size(F.array_intersect("_sha", "_shb")))
        .withColumn("n_a", F.size("_sha"))
        .withColumn("n_b", F.size("_shb"))
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
    )
    return verified.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "n_common", "n_a", "n_b", "jaccard"
    )


# ---------------------------------------------------------------------------
# SimHash (approximate; 64-bit signature + hamming-distance candidates)
# ---------------------------------------------------------------------------


def simhash(col: Column | str, seed: int = 42) -> Column:
    """64-bit SimHash of the token multiset, as BIGINT.

    Per token: xxhash64 → each bit contributes ±1; signature bit b is 1
    iff the sum over tokens is positive. Expressed as a fold over the
    token array into a 64-int accumulator (zip_with add), then bits →
    BIGINT. Pure Column expressions; one pass over tokens.
    """
    # hash each token ONCE, then fold per bit position (shift amounts
    # must be Python ints — shiftright does not accept a Column)
    hashes = F.transform(tokens(col), lambda t: F.xxhash64(F.lit(seed), t))

    def bit_sum(b: int) -> Column:
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    sig = F.lit(0).cast("bigint")
    for b in range(64):
        sig = sig.bitwiseXOR(  # disjoint bits: XOR == sum, no overflow
            F.when(bit_sum(b) > 0, F.shiftleft(F.lit(1).cast("bigint"), b)).otherwise(
                F.lit(0).cast("bigint")
            )
        )
    return sig


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Near-dup candidates with hamming(simhash) ≤ max_hamming.

    Blocking (pigeonhole): split the 64-bit signature into
    ``max_hamming + 1`` chunks — a pair within the hamming budget must
    agree exactly on ≥1 chunk, so joining on (chunk_idx, chunk_value)
    is lossless and never all-pairs. Verification = bit_count(xor).
    Wider budgets → narrower chunks → bigger collision buckets; at
    corpus scale keep max_hamming small (≤7) or pre-block by shard.
    """
    if not 0 <= max_hamming <= 31:
        raise ValueError("max_hamming must be in [0, 31]")
    n_chunks = max_hamming + 1
    base, rem = divmod(64, n_chunks)
    chunk_specs = []  # (offset, width)
    off = 0
    for i in range(n_chunks):
        w = base + (1 if i < rem else 0)
        chunk_specs.append((off, w))
        off += w
    sigs = df.select(
        F.col(id_col).alias("_id"), simhash(F.col(text_col), seed).alias("_sig")
    )
    chunks = sigs.select(
        "_id",
        "_sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftrightunsigned("_sig", o)
                        .bitwiseAND(F.lit((1 << w) - 1))
                        .alias("cv"),
                    )
                    for i, (o, w) in enumerate(chunk_specs)
                ]
            )
        ).alias("c"),
    ).select("_id", "_sig", "c.ci", "c.cv")
    a = chunks.withColumnsRenamed({"_id": "id_a", "_sig": "sig_a"})
    b = chunks.withColumnsRenamed({"_id": "id_b", "_sig": "sig_b"})
    return (
        a.join(b, ["ci", "cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
