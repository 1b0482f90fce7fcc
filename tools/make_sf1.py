"""Synthesize sf1 testdata by replicating sf0.1 ten times (round 4).

The driver ships sf{0.001,0.01,0.1} only; a second scale point needs a
10x corpus. Each replica shifts the integer keys by a per-table stride
so primary keys stay unique AND foreign keys stay consistent (orders.
o_custkey moves with customer.c_custkey, lineitem moves with orders/
part/supplier). region/nation stay 1x — like real TPC-H, dimension
cardinality is scale-invariant, and unshifted nationkeys keep every FK
valid. Embeddings get a tiny deterministic per-replica perturbation so
replicas are near- but not bit-identical (exercises the near-dup and
ANN paths the way a real crawled corpus would). Document text gets the
same treatment by default ("perturb" mode, round 5): each replica has
~15% of its tokens deterministically replaced with replica-tagged
markers, so replicas of one doc sit BELOW the usual near-dup
thresholds (token-Jaccard(replica, original) ≈ 0.74, and shingle-based
similarity lower still) — pair-quadratic operators (x2/x17/x21/x29)
then measure engine growth at scale, not output inflation. Pass mode
"verbatim" to get the old behavior (every replica an exact text dup,
inflating near-dup pair outputs ~reps²x — a deliberate stress of the
pair-verification paths, which is a different experiment).

Usage: python tools/make_sf1.py [out_dir] [reps] [perturb|verbatim]
       (defaults: .sfwork/sf1, 10, perturb)
"""
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rehiver_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
REPS = 10  # overridable via argv[2] (e.g. 100 -> sf10)
# strides: > max key at sf0.1, round numbers for debuggability
STRIDES = {
    "custkey": 1_000_000,
    "orderkey": 10_000_000,
    "partkey": 1_000_000,
    "suppkey": 100_000,
    "event_id": 10_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}
SHIFTS = {  # table -> {column: stride-name}
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "event_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".sfwork", "sf1"
    )
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else REPS
    mode = sys.argv[3] if len(sys.argv) > 3 else "perturb"
    if mode not in ("perturb", "verbatim"):
        raise SystemExit(f"unknown text mode {mode!r} (perturb|verbatim)")
    os.makedirs(out, exist_ok=True)
    spark = get_spark(app_name="make-sf1")
    spark.sparkContext.setLogLevel("ERROR")

    for t in ("region", "nation"):  # dimension tables: copy verbatim
        shutil.copy(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
        print(f"{t}: copied 1x")

    rep = spark.range(reps).select(F.col("id").alias("_rep"))
    for t, shifts in SHIFTS.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet").crossJoin(F.broadcast(rep))
        for col, stride in shifts.items():
            df = df.withColumn(col, F.col(col) + F.col("_rep") * STRIDES[stride])
        if t == "documents" and mode == "perturb":
            # replica-perturbed text (replica 0 = the original corpus,
            # untouched): replace tokens whose position-hash falls under
            # 15% with a replica-tagged marker. Positions are hashed per
            # (token, index, replica) so every replica mutates an
            # INDEPENDENT ~15% — any two replicas of one doc then share
            # ≈(0.85)² of their tokens (J ≈ 0.56) and replica-vs-original
            # shares 0.85 (J ≈ 0.74), both under the 0.8-ish near-dup
            # thresholds; shingle similarity decays faster still.
            words = F.split(F.col("text"), " ")
            marked = F.transform(
                words,
                lambda w, i: F.when(
                    (F.col("_rep") > 0)
                    & (
                        F.pmod(F.xxhash64(w, i, F.col("_rep")), F.lit(100))
                        < F.lit(15)
                    ),
                    F.concat(
                        F.lit("repv"),
                        F.col("_rep").cast("string"),
                        F.lit("n"),
                        F.pmod(F.xxhash64(i, F.col("_rep")), F.lit(9973)).cast(
                            "string"
                        ),
                    ),
                ).otherwise(w),
            )
            df = df.withColumn("text", F.array_join(marked, " "))
        if t == "embeddings":
            # near-identical, not identical: nudge each component by a
            # replica-dependent epsilon (deterministic, direction-ish
            # preserving) so ANN/semdedup see 10 close neighbors, not
            # 10 bit-equal vectors
            df = df.withColumn(
                "embedding",
                F.transform(
                    "embedding", lambda x, i: x + (F.col("_rep") * 1e-3) * ((i % 7) - 3)
                ),
            )
        cols = [c for c in df.columns if c != "_rep"]
        dest = f"{out}/{t}.parquet"
        if os.path.isdir(dest):
            shutil.rmtree(dest)
        df.select(*cols).repartition(8 if reps <= 10 else 32).write.mode("overwrite").parquet(dest)
        n = spark.read.parquet(dest).count()
        print(f"{t}: {n} rows")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
