import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    from rehiver_spark.operators.multimodal import media_from_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return media_from_documents(docs, kind="image")


def test_decode_deterministic(media):
    from rehiver_spark.operators.multimodal import decode_media

    a = {r["media_id"]: (r["byte_len"], r["sha16"], r["width"], r["height"]) for r in decode_media(media).collect()}
    b = {r["media_id"]: (r["byte_len"], r["sha16"], r["width"], r["height"]) for r in decode_media(media).collect()}
    assert a == b and len(a) > 0
    assert all(v[0] > 0 and v[2] >= 64 for v in a.values())
    assert all(r_err is None for r_err in [])  # no errors field check below


def test_decode_errors_tolerated(spark):
    from rehiver_spark.operators.multimodal import decode_media

    df = spark.createDataFrame(
        [(1, "weird_kind", bytearray(b"xx"), None)],
        "media_id bigint, kind string, payload binary, meta map<string,string>",
    )
    # fake decoder handles unknown kind as video-shape; real decoder errors per-row
    out = decode_media(df, fake=False).first()
    assert out["error"] is not None and "NotImplementedError" in out["error"]


def test_features_shape_and_norm(media):
    from rehiver_spark.operators.multimodal import FEATURE_DIM, extract_features

    row = extract_features(media).first()
    assert len(row["feature"]) == FEATURE_DIM
    assert abs(sum(row["feature"]) - 1.0) < 1e-9


def test_frame_sample_plan(spark):
    from rehiver_spark.operators.multimodal import decode_media, frame_sample_plan, media_from_documents

    docs = spark.createDataFrame([(1, "hello video", "s")], "doc_id bigint, text string, source string")
    media = media_from_documents(docs, kind="video")
    frames = frame_sample_plan(decode_media(media), every_ms=1000)
    rows = frames.collect()
    assert len(rows) >= 6  # duration ≥ 5000ms → ≥6 sampled frames
    assert rows[0]["offset_ms"] == 0


def test_metadata_projection_prunes_payload(media, tmp_path):
    # column pruning: metadata-only query must not read the payload column
    p = str(tmp_path / "media")
    media.write.parquet(p)
    df = media.sparkSession.read.parquet(p).select("media_id", "kind")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan.split("ReadSchema:")[-1]


def test_decode_audio_and_video_kinds(spark):
    from pyspark.sql import functions as F

    from rehiver_spark.operators.multimodal import decode_media, media_from_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    for kind, present, absent in [
        ("audio", ["duration_ms", "sample_rate"], ["width", "height"]),
        ("video", ["width", "height", "duration_ms"], ["sample_rate"]),
    ]:
        dec = decode_media(media_from_documents(docs, kind=kind))
        rows = dec.collect()
        assert len(rows) == 20
        assert all(r["error"] is None for r in rows)
        for col in present:
            assert all(r[col] is not None for r in rows), (kind, col)
        for col in absent:
            assert all(r[col] is None for r in rows), (kind, col)
    # determinism: same payload -> same decoded metadata
    d1 = decode_media(media_from_documents(docs, kind="audio")).collect()
    d2 = decode_media(media_from_documents(docs, kind="audio")).collect()
    assert sorted(map(str, d1)) == sorted(map(str, d2))


def test_real_decode_stub_raises(spark):
    import pytest

    from rehiver_spark.operators.multimodal import _real_decode

    with pytest.raises(NotImplementedError):
        _real_decode("audio", b"xx")


def test_resize_media_clamps_and_passthrough(spark):
    from rehiver_spark.operators.multimodal import (
        _fake_decode,
        media_from_documents,
        resize_media,
    )

    docs = spark.createDataFrame(
        [(1, "a tiny doc", "s"), (2, "another body of text here", "s")],
        "doc_id long, text string, source string",
    )
    media = media_from_documents(docs, kind="image").unionByName(
        media_from_documents(docs.filter("doc_id = 1"), kind="audio").select(
            (F.col("media_id") + 100).alias("media_id"), "kind", "payload", "meta"
        )
    )
    rows = {r["media_id"]: r for r in resize_media(media, max_side=256).collect()}
    for mid in (1, 2):
        r = rows[mid]
        d = _fake_decode("image", rows[mid]["payload"] and b"" or b"")  # dims from src text
        assert r["error"] is None
        assert max(r["width"], r["height"]) <= 256
        # aspect preserved under integer math: |w/h - tw/th| small
        assert abs(r["src_width"] / r["src_height"] - r["width"] / r["height"]) < 0.05
        assert r["sha16"] is not None and len(r["sha16"]) == 16
    # non-image rows pass through untouched with NULL dims
    a = rows[101]
    assert a["kind"] == "audio" and a["width"] is None and a["error"] is None


# a valid 1x1 PNG, byte-literal so no imaging lib is needed to build it
_TINY_PNG = __import__("base64").b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
)


def test_real_decode_png_stdlib():
    """Real-codec path: genuine PNG bytes decode via the stdlib codec —
    no imaging library required anywhere."""
    from rehiver_spark.operators.multimodal import _real_decode

    d = _real_decode("image", _TINY_PNG)
    assert (d["width"], d["height"]) == (1, 1)
    assert d["duration_ms"] is None and d["sample_rate"] is None


def test_decode_media_real_path_png_jpeg_and_missing_codec(spark):
    """decode_media(fake=False): PNG rows decode for real everywhere;
    JPEG metadata parses lib-free (r10: functions/jpeg.py) so a
    malformed JPEG is a ValueError from the parser on EVERY host, not
    a Pillow complaint; a non-PNG/JPEG image (GIF here) without Pillow
    lands in `error` naming the missing dependency — the job itself
    never fails."""
    from rehiver_spark.functions.jpeg import minimal_jpeg

    jpeg_junk = b"\xff\xd8\xff\xe0" + b"\x00" * 32  # SOI then garbage
    gif_ish = b"GIF87a" + b"\x00" * 16
    df = spark.createDataFrame(
        [
            (1, "image", bytearray(_TINY_PNG)),
            (2, "image", bytearray(jpeg_junk)),
            (3, "image", bytearray(gif_ish)),
            (4, "image", bytearray(minimal_jpeg(17, 9))),
        ],
        "media_id bigint, kind string, payload binary",
    )
    from rehiver_spark.operators.multimodal import decode_media

    rows = {r["media_id"]: r for r in decode_media(df, fake=False).collect()}
    assert len(rows) == 4
    png = rows[1]
    assert png["error"] is None and (png["width"], png["height"]) == (1, 1)
    junk = rows[2]
    assert junk["error"] is not None and "ValueError" in junk["error"]
    assert junk["width"] is None
    gif = rows[3]
    try:
        import PIL  # noqa: F401

        assert gif["error"] is not None  # 22 junk bytes, not a real GIF
    except ImportError:
        assert gif["error"] is not None and "Pillow" in gif["error"]
        assert gif["width"] is None
    jpg = rows[4]
    assert jpg["error"] is None and (jpg["width"], jpg["height"]) == (17, 9)


def test_resize_media_real_png_roundtrip(spark):
    """resize_media(fake=False) on real PNG payloads: stdlib decode →
    nearest-neighbor → re-encode, with the output payload being a valid
    PNG of the declared target dims."""
    from rehiver_spark.functions.png import png_decode, png_encode
    from rehiver_spark.operators.multimodal import resize_media

    # 300x100 horizontal gradient, RGBA
    w, h = 300, 100
    rgba = bytearray()
    for y in range(h):
        for x in range(w):
            rgba += bytes((x % 256, y % 256, (x + y) % 256, 255))
    big = png_encode(w, h, bytes(rgba))
    df = spark.createDataFrame(
        [(1, "image", bytearray(big)), (2, "image", bytearray(_TINY_PNG))],
        "media_id bigint, kind string, payload binary",
    )
    rows = {r["media_id"]: r for r in resize_media(df, max_side=128, fake=False).collect()}
    r = rows[1]
    assert r["error"] is None
    assert (r["src_width"], r["src_height"]) == (300, 100)
    assert (r["width"], r["height"]) == (128, 42)  # 100*128//300
    ow, oh, opx = png_decode(bytes(r["payload"]))
    assert (ow, oh) == (128, 42) and len(opx) == 128 * 42 * 4
    # a payload already within max_side is re-encoded at source dims
    tiny = rows[2]
    assert tiny["error"] is None and (tiny["width"], tiny["height"]) == (1, 1)


def _tiny_wav(n_frames=1600, rate=16000):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(bytes(2 * n_frames))
    return buf.getvalue()


def test_real_decode_wav_stdlib(spark):
    """Real audio path: genuine WAV bytes decode via the stdlib wave
    module — duration and sample rate from the actual header."""
    from rehiver_spark.operators.multimodal import _real_decode, decode_media

    d = _real_decode("audio", _tiny_wav(n_frames=8000, rate=16000))
    assert d["sample_rate"] == 16000 and d["duration_ms"] == 500
    assert d["width"] is None and d["height"] is None
    # and through the Spark kernel, mixed with a non-WAV audio row
    df = spark.createDataFrame(
        [(1, "audio", bytearray(_tiny_wav())), (2, "audio", bytearray(b"ID3 not wav"))],
        "media_id bigint, kind string, payload binary",
    )
    rows = {r["media_id"]: r for r in decode_media(df, fake=False).collect()}
    assert rows[1]["error"] is None and rows[1]["duration_ms"] == 100
    assert rows[2]["error"] is not None  # compressed audio: documented stub
