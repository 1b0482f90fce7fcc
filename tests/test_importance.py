"""DSIR importance weighting (operators/importance.py): the score must
actually separate target-like from non-target-like text, be bit-stable
across parallelism, skip empty documents visibly, and keep the gram
stream un-shuffled for the model lookup (broadcast joins only)."""

import pytest
from pyspark.sql import functions as F

from rehiver_spark.operators.importance import dsir_scores, feature_buckets


@pytest.fixture(scope="module")
def corpora(spark):
    tgt_like = [
        "the quarterly report shows revenue growth and margin expansion",
        "revenue and operating margin grew in the quarterly report",
        "the board reviewed the quarterly revenue report",
    ]
    other = [
        "jellyfish drift through the moonlit kelp forest silently",
        "volcanic basalt columns rise above the glacier meltwater",
        "a capuchin cracked palm nuts with a quartz hammerstone",
    ]
    rows = [(i, "t", s) for i, s in enumerate(tgt_like)] + [
        (100 + i, "o", s) for i, s in enumerate(other)
    ]
    raw = spark.createDataFrame(rows, "doc_id long, source string, text string")
    target = raw.filter(F.col("source") == "t")
    return raw, target


def test_dsir_separates_target_like_documents(spark, corpora):
    raw, target = corpora
    got = {r["doc_id"]: r["score"] for r in dsir_scores(raw, target).collect()}
    t_scores = [got[i] for i in range(3)]
    o_scores = [got[100 + i] for i in range(3)]
    assert min(t_scores) > max(o_scores), (t_scores, o_scores)


def test_dsir_score_is_parallelism_invariant(spark, corpora):
    raw, target = corpora
    a = sorted(map(tuple, dsir_scores(raw, target).collect()))
    b = sorted(
        map(tuple, dsir_scores(raw.repartition(13), target.coalesce(1)).collect())
    )
    assert a == b


def test_dsir_empty_doc_absent_not_zero(spark):
    raw = spark.createDataFrame(
        [(1, "x words here"), (2, ""), (3, None)], "doc_id long, text string"
    )
    got = {r["doc_id"] for r in dsir_scores(raw, raw.limit(1)).collect()}
    assert got == {1}


def test_dsir_gram_stream_joins_broadcast_only(spark, corpora):
    raw, target = corpora
    p = (
        dsir_scores(raw, target)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p


def test_feature_buckets_counts_unigrams_plus_bigrams(spark):
    df = spark.createDataFrame([(7, "a b c")], "doc_id long, text string")
    n = feature_buckets(df).count()
    assert n == 5  # 3 unigrams + 2 bigrams
