"""JPEG real-decode tier (r5 verdict stretch item 8; r10 task 6; r11
pixel codec; r12 progressive).

Since round 10 JPEG METADATA (width/height from the SOF frame header)
parses lib-free via functions/jpeg.py. Round 11 adds the lib-free
BASELINE PIXEL codec (decode_baseline/encode_baseline — per-file
Huffman/quant tables, numpy IDCT). Round 12 adds full PROGRESSIVE
decode (decode_jpeg: spectral selection + successive approximation,
both refinement protocols) and encode_progressive, so the whole pixel
tier — progressive included — runs everywhere with no Pillow gate:
fixtures are Pillow-encoded when Pillow exists (cross-validating the
decoder against a real codec) and encode_baseline/encode_progressive
otherwise — real pixels either way.
"""

import io

import pytest


def _pillow():
    try:
        from PIL import Image

        return Image
    except ImportError:
        return None


def _gradient(w: int, h: int):
    import numpy as np

    img = np.zeros((h, w, 3), np.uint8)
    for y in range(h):
        for x in range(w):
            img[y, x] = (x * 6 % 256, y * 10 % 256, (x + y) % 256)
    return img


def _jpeg_bytes(w: int = 40, h: int = 24, progressive: bool = False) -> bytes:
    """A JPEG fixture with REAL pixels: Pillow-encoded when Pillow
    exists, encode_baseline/encode_progressive (r12: the progressive
    fixture is real pixels lib-free too) otherwise."""
    Image = _pillow()
    if Image is None:
        from rehiver_spark.functions.jpeg import encode_baseline, encode_progressive

        enc = encode_progressive if progressive else encode_baseline
        return enc(_gradient(w, h), quality=92)
    im = Image.fromarray(_gradient(w, h), "RGB")
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
    """Pixel-level JPEG resize, lib-free since r11: decode_baseline →
    nearest-neighbor → encode_baseline inside the mapInPandas path.
    The resized payload must itself re-decode to the target dims (our
    codec always; PIL additionally when present)."""
    from rehiver_spark.functions.jpeg import decode_baseline
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
    w, h, _nc, _arr = decode_baseline(bytes(row["payload"]))
    assert (w, h) == (row["width"], row["height"])
    PIL_Image = _pillow()
    if PIL_Image is not None:
        im = PIL_Image.open(io.BytesIO(bytes(row["payload"])))
        assert (im.width, im.height) == (row["width"], row["height"])


def test_jpeg_codec_roundtrip_tolerance():
    """encode_baseline → decode_baseline self-roundtrip: quality 100
    uses an all-ones quant table, so the only loss is DCT roundoff —
    every pixel within ±2; q92 stays visually tight (mean < 2)."""
    import numpy as np

    from rehiver_spark.functions.jpeg import decode_baseline, encode_baseline

    img = _gradient(40, 24)
    for q, max_tol, mean_tol in ((100, 2, 0.5), (92, 24, 2.0)):
        b = encode_baseline(img, quality=q)
        w, h, nc, out = decode_baseline(b)
        assert (w, h, nc) == (40, 24, 3)
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.max() <= max_tol and err.mean() <= mean_tol, q
    # grayscale + odd (non-multiple-of-8) dims
    g = (np.arange(13 * 7).reshape(13, 7) * 5 % 256).astype(np.uint8)
    w, h, nc, out = decode_baseline(encode_baseline(g, quality=100))
    assert (w, h, nc) == (7, 13, 1)
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 2


def test_jpeg_decode_rejects_out_of_scope():
    import pytest as _pytest

    from rehiver_spark.functions.jpeg import decode_baseline, minimal_jpeg

    with _pytest.raises(ValueError, match="progressive"):
        decode_baseline(minimal_jpeg(8, 8, progressive=True))
    with _pytest.raises(ValueError, match="not a JPEG"):
        decode_baseline(b"\x89PNG\r\n\x1a\n")
    with _pytest.raises(ValueError, match="no SOS"):
        decode_baseline(minimal_jpeg(8, 8))  # header-only stub: no scan


def test_jpeg_decode_cross_validates_against_pillow():
    """Wherever Pillow exists, decode_baseline must read REAL
    libjpeg-encoded files (4:2:0 subsampling, optimized Huffman,
    restart intervals) within codec tolerance; Pillow must also read
    encode_baseline's output back pixel-exact-ish."""
    import numpy as np

    Image = _pillow()
    if Image is None:
        pytest.skip("Pillow absent: cross-validation runs where it exists")
    from rehiver_spark.functions.jpeg import decode_baseline, encode_baseline

    img = _gradient(40, 24)
    # our decoder on Pillow files (subsampling on/off, restarts)
    for kwargs in (
        {"quality": 95},
        {"quality": 95, "subsampling": 0},
        {"quality": 90, "restart_marker_blocks": 2},
    ):
        buf = io.BytesIO()
        Image.fromarray(img, "RGB").save(buf, format="JPEG", **kwargs)
        w, h, nc, out = decode_baseline(buf.getvalue())
        ref = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
        assert (w, h, nc) == (40, 24, 3)
        assert np.abs(out.astype(int) - ref.astype(int)).max() <= 24, kwargs
    # Pillow on our files
    mine = encode_baseline(img, quality=100)
    ref = np.asarray(Image.open(io.BytesIO(mine)).convert("RGB"))
    assert np.abs(ref.astype(int) - img.astype(int)).max() <= 4


def test_jpeg_entropy_fill_bytes_before_markers():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may pad the stream
    before a marker (RSTn or EOI). The scan splitter must skip the run
    and dispatch on the first non-FF byte, not truncate mid-scan
    (r11 advice)."""
    import numpy as np

    from rehiver_spark.functions.jpeg import decode_baseline, encode_baseline

    img = _gradient(24, 16)
    b = encode_baseline(img, quality=100)
    assert b.endswith(b"\xff\xd9")
    base = decode_baseline(b)[3]
    padded = b[:-2] + b"\xff\xff\xff" + b[-2:]  # FF fill before EOI
    w, h, nc, out = decode_baseline(padded)
    assert (w, h, nc) == (24, 16, 3)
    assert np.array_equal(out, base)


def test_jpeg_truncated_dht_raises_value_error():
    """A DHT whose 16 count bytes (or declared values) run past the
    segment end must raise the module's ValueError('truncated DHT')
    convention, not an uninformative IndexError (r11 advice)."""
    from rehiver_spark.functions.jpeg import decode_baseline

    # counts cut off: seglen 8 leaves only 6 payload bytes (< 1+16)
    short_counts = b"\xff\xd8\xff\xc4\x00\x08" + b"\x00" * 6
    with pytest.raises(ValueError, match="truncated DHT"):
        decode_baseline(short_counts)
    # counts complete but the 5 declared values overrun the segment
    short_vals = (
        b"\xff\xd8\xff\xc4\x00\x13" + b"\x00" + b"\x05" + b"\x00" * 15
    )
    with pytest.raises(ValueError, match="truncated DHT"):
        decode_baseline(short_vals)


def test_resize_media_progressive_jpeg_lib_free(spark):
    """resize_media(fake=False) on a progressive JPEG resizes LIB-FREE
    since r12 (decode_jpeg handles SOF2); a truly out-of-scope stream
    (header-only stub, no scan) still lands the CODEC's ValueError in
    the error column — never an ImportError — with Pillow absent."""
    from rehiver_spark.functions.jpeg import minimal_jpeg
    from rehiver_spark.operators.multimodal import resize_media

    payload = _jpeg_bytes(40, 24, progressive=True)
    stub = minimal_jpeg(8, 8, progressive=True)  # header-only: no SOS
    df = spark.createDataFrame(
        [(1, "image", bytearray(payload)), (2, "image", bytearray(stub))],
        "media_id long, kind string, payload binary",
    )
    rows = {
        r["media_id"]: r
        for r in resize_media(df, max_side=16, fake=False).collect()
    }
    assert rows[1]["error"] is None
    assert (rows[1]["src_width"], rows[1]["src_height"]) == (40, 24)
    assert max(rows[1]["width"], rows[1]["height"]) <= 16
    if _pillow() is None:
        assert rows[2]["error"] is not None
        assert "ValueError" in rows[2]["error"]
        assert "ImportError" not in rows[2]["error"]


def test_progressive_codec_matches_baseline_pixels():
    """encode_progressive shares encode_baseline's quantized
    coefficients, so decode_jpeg on the progressive stream must be
    BIT-IDENTICAL to decode_baseline on the baseline stream — the
    strongest lib-free pin on all four progressive scan paths (DC/AC
    first + both refinements). Includes a flat image (long EOB runs in
    both AC scans) and odd non-multiple-of-8 dims."""
    import numpy as np

    from rehiver_spark.functions.jpeg import (
        decode_baseline,
        decode_jpeg,
        encode_baseline,
        encode_progressive,
    )

    rng = np.random.default_rng(42)
    fixtures = [
        _gradient(40, 24),                                      # RGB, smooth
        rng.integers(0, 256, size=(13, 7), dtype=np.uint8),     # gray, odd
        np.full((32, 48, 3), 77, dtype=np.uint8),               # flat: EOB runs
        rng.integers(0, 256, size=(17, 33, 3), dtype=np.uint8), # dense, odd
    ]
    for img in fixtures:
        for q in (100, 92, 60):
            pw, ph, pnc, pout = decode_jpeg(encode_progressive(img, quality=q))
            bw, bh, bnc, bout = decode_baseline(encode_baseline(img, quality=q))
            assert (pw, ph, pnc) == (bw, bh, bnc), (img.shape, q)
            assert np.array_equal(pout, bout), (img.shape, q)


def test_decode_baseline_still_rejects_progressive():
    """The baseline-tier entrypoint keeps its contract (and error
    message) — only decode_jpeg opts into SOF2."""
    from rehiver_spark.functions.jpeg import (
        decode_baseline,
        encode_progressive,
    )

    b = encode_progressive(_gradient(16, 16), quality=92)
    with pytest.raises(ValueError, match="progressive"):
        decode_baseline(b)


def test_progressive_cross_validates_against_pillow():
    """Wherever Pillow exists: decode_jpeg must read libjpeg's standard
    progressive scan script (spectral selection + successive
    approximation with Al up to 2) within codec tolerance, and Pillow
    must read encode_progressive's output back pixel-close."""
    import numpy as np

    Image = _pillow()
    if Image is None:
        pytest.skip("Pillow absent: cross-validation runs where it exists")
    from rehiver_spark.functions.jpeg import decode_jpeg, encode_progressive

    img = _gradient(40, 24)
    buf = io.BytesIO()
    Image.fromarray(img, "RGB").save(
        buf, format="JPEG", quality=95, progressive=True, subsampling=0
    )
    w, h, nc, out = decode_jpeg(buf.getvalue())
    ref = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
    assert (w, h, nc) == (40, 24, 3)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 24
    # and the other direction
    mine = encode_progressive(img, quality=100)
    ref2 = np.asarray(Image.open(io.BytesIO(mine)).convert("RGB"))
    assert np.abs(ref2.astype(int) - img.astype(int)).max() <= 4


def test_progressive_dqt_between_scans_snapshot_semantics():
    """Dequantization happens once at EOI, so the decoder snapshots
    each quant table at its first progressive SOS (r12 ADVICE): a DQT
    segment between scans that REDEFINES a table in use raises loudly
    instead of silently applying the final table retroactively, while
    a bit-identical re-emission (some encoders repeat tables) still
    decodes to the same pixels."""
    import numpy as np

    from rehiver_spark.functions.jpeg import decode_jpeg, encode_progressive

    img = _gradient(40, 24)
    stream = encode_progressive(img, quality=60)
    # entropy data is byte-stuffed (FF -> FF 00 / RSTn), so every FF DA
    # is a real SOS; splice in front of the SECOND scan
    first = stream.index(b"\xff\xda")
    second = stream.index(b"\xff\xda", first + 2)

    redefined = (
        b"\xff\xdb" + (2 + 1 + 64).to_bytes(2, "big") + bytes([0x00]) + bytes([2] * 64)
    )
    with pytest.raises(ValueError, match="DQT 0 redefined"):
        decode_jpeg(stream[:second] + redefined + stream[second:])

    # re-emitting the ORIGINAL table 0 between scans is harmless
    dqt_start = stream.index(b"\xff\xdb")
    seglen = (stream[dqt_start + 2] << 8) | stream[dqt_start + 3]
    table0 = stream[dqt_start : dqt_start + 2 + 2 + 1 + 64]
    assert seglen >= 2 + 1 + 64
    reemit = b"\xff\xdb" + (2 + 1 + 64).to_bytes(2, "big") + table0[4 : 4 + 1 + 64]
    w, h, nc, base = decode_jpeg(stream)
    w2, h2, nc2, out = decode_jpeg(stream[:second] + reemit + stream[second:])
    assert (w, h, nc) == (w2, h2, nc2)
    assert np.array_equal(base, out)
