"""Pillow-gated real-decode tier (r5 verdict stretch item 8).

The container has no image codec library, so the mm real-decode branch
is stdlib-only (PNG via functions/png.py, WAV via ``wave``). These
tests extend that posture to JPEG: they generate a JPEG with Pillow
itself and drive decode_media/resize_media(fake=False) through the
PIL fallback branch (multimodal.py). Here they skip cleanly
(``importorskip``); wherever Pillow exists they run for real — the
same opt-in discipline as the live-S3 tier (test_s3_live.py).
"""

import io

import pytest

PIL_Image = pytest.importorskip(
    "PIL.Image", reason="Pillow-gated tier: no image codec lib in this container"
)


def _jpeg_bytes(w: int = 40, h: int = 24) -> bytes:
    im = PIL_Image.new("RGB", (w, h))
    px = im.load()
    for y in range(h):
        for x in range(w):
            px[x, y] = (x * 6 % 256, y * 10 % 256, (x + y) % 256)
    buf = io.BytesIO()
    im.save(buf, format="JPEG", quality=90)
    return buf.getvalue()


def test_real_decode_jpeg_via_pillow():
    from rehiver_spark.operators.multimodal import _real_decode

    d = _real_decode("image", _jpeg_bytes(40, 24))
    assert (d["width"], d["height"]) == (40, 24)
    assert d["duration_ms"] is None and d["sample_rate"] is None


def test_decode_media_real_jpeg(spark):
    from rehiver_spark.operators.multimodal import decode_media

    df = spark.createDataFrame(
        [(1, "image", bytearray(_jpeg_bytes(40, 24)))],
        "media_id long, kind string, payload binary",
    )
    [row] = decode_media(df, fake=False).collect()
    assert row["error"] is None
    assert (row["width"], row["height"]) == (40, 24)
    assert row["byte_len"] > 0 and len(row["sha16"]) == 16


def test_resize_media_real_jpeg(spark):
    from rehiver_spark.functions.png import fit_dims
    from rehiver_spark.operators.multimodal import resize_media

    payload = _jpeg_bytes(64, 16)
    df = spark.createDataFrame(
        [(1, "image", bytearray(payload))],
        "media_id long, kind string, payload binary",
    )
    [row] = resize_media(df, max_side=32, fake=False).collect()
    assert row["error"] is None
    assert (row["src_width"], row["src_height"]) == (64, 16)
    assert (row["width"], row["height"]) == fit_dims(64, 16, 32)
    # the resized payload must itself decode to the target dims
    im = PIL_Image.open(io.BytesIO(bytes(row["payload"])))
    assert (im.width, im.height) == (row["width"], row["height"])
