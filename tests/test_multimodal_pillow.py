"""JPEG real-decode tier (r5 verdict stretch item 8; r10 task 6).

Since round 10 JPEG METADATA (width/height from the SOF frame header)
parses lib-free via functions/jpeg.py, so the decode-path tests here
run everywhere: with Pillow present the fixture is a real encoded
JPEG, without it a structurally-valid SOF header fixture
(``minimal_jpeg``) — same segment grammar, no codec needed. Only the
PIXEL resize test still requires a codec and keeps the Pillow gate
(``importorskip`` inside the test), the same opt-in discipline as the
live-S3 tier (test_s3_live.py).
"""

import io

import pytest


def _pillow():
    try:
        from PIL import Image

        return Image
    except ImportError:
        return None


def _jpeg_bytes(w: int = 40, h: int = 24, progressive: bool = False) -> bytes:
    """A JPEG fixture: Pillow-encoded when Pillow exists (real pixels),
    otherwise the lib-free SOF header fixture (decodable metadata)."""
    Image = _pillow()
    if Image is None:
        from rehiver_spark.functions.jpeg import minimal_jpeg

        return minimal_jpeg(w, h, progressive=progressive)
    im = Image.new("RGB", (w, h))
    px = im.load()
    for y in range(h):
        for x in range(w):
            px[x, y] = (x * 6 % 256, y * 10 % 256, (x + y) % 256)
    buf = io.BytesIO()
    im.save(buf, format="JPEG", quality=90, progressive=progressive)
    return buf.getvalue()


def test_real_decode_jpeg_metadata():
    from rehiver_spark.operators.multimodal import _real_decode

    for progressive in (False, True):
        d = _real_decode("image", _jpeg_bytes(40, 24, progressive=progressive))
        assert (d["width"], d["height"]) == (40, 24), progressive
        assert d["duration_ms"] is None and d["sample_rate"] is None


def test_jpeg_info_parses_sof_and_rejects_malformed():
    from rehiver_spark.functions.jpeg import is_jpeg, jpeg_info, minimal_jpeg

    # both frame types, odd dims, 1- and 3-component
    for prog in (False, True):
        for (w, h, nc) in [(40, 24, 3), (1, 1, 1), (65535, 3, 3)]:
            b = _jpeg_bytes(w, h, progressive=prog) if (w, h, nc) == (40, 24, 3) \
                else minimal_jpeg(w, h, progressive=prog, ncomp=nc)
            got = jpeg_info(b)
            assert got[:2] == (w, h), (prog, w, h, got)
    assert not is_jpeg(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        jpeg_info(b"\xff\xd8\xff")  # truncated after SOI
    with pytest.raises(ValueError):
        jpeg_info(b"not a jpeg at all")
    # EOI before any SOF
    with pytest.raises(ValueError):
        jpeg_info(b"\xff\xd8\xff\xd9\x00\x00")
    # bad segment length (runs past end of stream)
    with pytest.raises(ValueError):
        jpeg_info(b"\xff\xd8\xff\xe0\xff\xff")
    # cross-validation clause: wherever Pillow exists, the lib-free
    # SOF parser must agree with the real decoder on real JPEGs
    Image = _pillow()
    if Image is not None:
        for prog in (False, True):
            for (w, h) in [(40, 24), (7, 13), (1, 1)]:
                b = _jpeg_bytes(w, h, progressive=prog)
                assert jpeg_info(b)[:2] == (w, h) == Image.open(io.BytesIO(b)).size


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
    """PIXEL-level JPEG work genuinely needs a codec — Pillow-gated."""
    PIL_Image = pytest.importorskip(
        "PIL.Image", reason="JPEG pixel resize needs an image codec lib"
    )
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
