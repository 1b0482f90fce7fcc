import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def hive_dir(spark):
    from rehiver_spark.flagship import partitioned_events_dir

    return partitioned_events_dir(spark, "/root/testdata/sf0.001")


def test_read_matching_scopes_files(spark, hive_dir):
    from rehiver_spark.sources.reader import read_matching

    df = read_matching(spark, hive_dir, "year=2024/month=1/day=5/**")
    assert df.count() > 0
    assert {r["day"] for r in df.select("day").distinct().collect()} == {5}
    # partition columns survive via basePath
    assert {"year", "month", "day", "hour"} <= set(df.columns)
    total = spark.read.parquet(hive_dir).count()
    assert df.count() < total


def test_read_matching_negation(spark, hive_dir):
    from rehiver_spark.sources.reader import read_matching

    df = read_matching(
        spark, hive_dir, ["year=2024/month=1/day=?/**", "!**/day=3/**"]
    )
    days = {r["day"] for r in df.select("day").distinct().collect()}
    assert 3 not in days and days <= set(range(1, 10)) and days


def test_read_matching_no_match_raises(spark, hive_dir):
    from rehiver_spark.sources.reader import read_matching

    with pytest.raises(FileNotFoundError):
        read_matching(spark, hive_dir, "year=1999/**")


def test_events_ts_data_contract(spark):
    """Pin the ts unit handling: the testdata is timestamp[us] and all
    events live in 2024. A unit mix-up (the round-2 nanos bug) lands
    everything in 1970 — this test is the tripwire."""
    from rehiver_spark.session import read_events

    ev = read_events(spark, "/root/testdata/sf0.001")
    row = ev.agg(
        F.min(F.year("ts")).alias("ymin"), F.max(F.year("ts")).alias("ymax")
    ).first()
    assert row["ymin"] == 2024 and row["ymax"] == 2024


def test_read_events_genuine_nanos_fallback(spark, tmp_path):
    """A REAL TIMESTAMP(NANOS) events file must take the bigint÷1000
    path and land in the right epoch — the footer sniff decides, never
    an assumption about the unit."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rehiver_spark.session import read_events

    base = 1704067200 * 10**9  # 2024-01-01 UTC in ns
    ts = pa.array(
        np.array([base + i * 3_600 * 10**9 for i in range(5)], dtype="int64"),
        type=pa.timestamp("ns"),
    )
    t = pa.table(
        {
            "event_id": pa.array(range(5), pa.int64()),
            "ts": ts,
            "user_id": pa.array([1] * 5, pa.int64()),
            "event_type": pa.array(["click"] * 5),
            "value": pa.array([1.0] * 5),
            "props": pa.array(["{}"] * 5),
        }
    )
    d = tmp_path / "events.parquet"
    d.mkdir()
    pq.write_table(t, str(d / "part-0.parquet"), coerce_timestamps=None, version="2.6")
    ev = read_events(spark, str(tmp_path))
    rows = sorted(r["ts"] for r in ev.select("ts").collect())
    assert rows[0].year == 2024 and rows[0].month == 1 and rows[0].day == 1
    assert (rows[-1] - rows[0]).total_seconds() == 4 * 3600


def test_read_path_glob(spark, hive_dir):
    from rehiver_spark.sources.reader import read_path_glob

    df = read_path_glob(spark, hive_dir + "/year=2024/month=1/day=5", "*.parquet")
    assert df.count() > 0


def _write_events_int64(tmp_path, values):
    """events.parquet with a RAW int64 ts column (no parquet unit)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = len(values)
    t = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(values, pa.int64()),
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array([1.0] * n),
            "props": pa.array(["{}"] * n),
        }
    )
    d = tmp_path / "events.parquet"
    d.mkdir()
    pq.write_table(t, str(d / "part-0.parquet"))


def test_read_events_raw_int64_micros_not_divided(spark, tmp_path):
    """A raw int64 ts column holding MICROseconds must not take the
    div-by-1000 nanos path (round-3 advice: the magnitude sniff must
    not repeat the round-2 failure class one level down)."""
    from rehiver_spark.session import read_events

    base_us = 1704067200 * 10**6  # 2024-01-01 UTC in µs
    _write_events_int64(tmp_path, [base_us + i * 3_600 * 10**6 for i in range(5)])
    rows = sorted(
        r["ts"] for r in read_events(spark, str(tmp_path)).select("ts").collect()
    )
    assert rows[0].year == 2024 and rows[0].month == 1 and rows[0].day == 1


def test_read_events_raw_int64_nanos_divided(spark, tmp_path):
    """A raw int64 ts column holding NANOseconds (magnitude >= 1e17)
    still takes the ÷1000 path."""
    from rehiver_spark.session import read_events

    base_ns = 1704067200 * 10**9
    _write_events_int64(tmp_path, [base_ns + i * 3_600 * 10**9 for i in range(5)])
    rows = sorted(
        r["ts"] for r in read_events(spark, str(tmp_path)).select("ts").collect()
    )
    assert rows[0].year == 2024 and rows[-1].year == 2024


def test_read_events_raw_int64_millis_and_seconds(spark, tmp_path):
    """Millisecond and second magnitudes decode to the same instants."""
    from rehiver_spark.session import read_events

    base_s = 1704067200
    _write_events_int64(tmp_path, [(base_s + i * 3_600) * 1000 for i in range(5)])
    ms_rows = sorted(
        r["ts"] for r in read_events(spark, str(tmp_path)).select("ts").collect()
    )
    assert ms_rows[0].year == 2024 and ms_rows[0].hour == 0

    import shutil

    shutil.rmtree(tmp_path / "events.parquet")
    _write_events_int64(tmp_path, [base_s + i * 3_600 for i in range(5)])
    s_rows = sorted(
        r["ts"] for r in read_events(spark, str(tmp_path)).select("ts").collect()
    )
    assert s_rows == ms_rows


def test_read_documents_formats(spark, tmp_path, sf_dir):
    import json

    from pyspark.sql import functions as F

    from rehiver_spark.sources.reader import read_documents

    # parquet passthrough keeps ids and extra columns
    d = read_documents(spark, f"{sf_dir}/documents.parquet")
    ref = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert d.count() == ref.count()
    assert d.columns[:4] == ["doc_id", "text", "source", "n_chars"]

    # jsonl: with and without doc_id
    rows = [
        {"doc_id": 7, "text": "seven", "source": "s1"},
        {"doc_id": 8, "text": "eight", "source": "s1"},
    ]
    jl = tmp_path / "docs.jsonl"
    jl.write_text("\n".join(json.dumps(r) for r in rows))
    dj = read_documents(spark, str(jl))
    assert {r["doc_id"] for r in dj.collect()} == {7, 8}
    assert dj.filter("n_chars = 5").count() == 2

    noid = tmp_path / "noid.jsonl"
    noid.write_text('{"text": "alpha", "source": "s2"}\n{"text": "alpha", "source": "s2"}')
    dn = read_documents(spark, str(noid))
    ids = [r["doc_id"] for r in dn.collect()]
    assert len(ids) == 2 and ids[0] == ids[1]  # content-addressed: dup text, same id
    # and the id is deterministic across re-reads
    assert ids[0] == read_documents(spark, str(noid)).first()["doc_id"]

    # csv
    cv = tmp_path / "docs.csv"
    cv.write_text("text,source\nhello world,web\nbye,web\n")
    dc = read_documents(spark, str(cv))
    assert dc.count() == 2 and dc.filter(F.col("text") == "hello world").count() == 1

    # raw text: one doc per file, source = file path
    tdir = tmp_path / "raw"
    tdir.mkdir()
    (tdir / "a.txt").write_text("doc a body")
    (tdir / "b.txt").write_text("doc b body longer")
    dt = read_documents(spark, str(tdir), fmt="text")
    got = {r["source"].split("/")[-1]: r["n_chars"] for r in dt.collect()}
    assert got == {"a.txt": 10, "b.txt": 17}

    with pytest.raises(ValueError):
        read_documents(spark, str(cv), fmt="avro")


def test_read_documents_jsonl_gz(spark, tmp_path):
    import gzip
    import json

    from rehiver_spark.sources.reader import read_documents

    gz = tmp_path / "docs.jsonl.gz"
    rows = [{"doc_id": i, "text": f"doc {i}", "source": "gz"} for i in range(5)]
    with gzip.open(gz, "wt") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    d = read_documents(spark, str(gz))  # format inferred through .gz
    assert d.count() == 5
    assert {r["doc_id"] for r in d.collect()} == set(range(5))
