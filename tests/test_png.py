"""Stdlib PNG codec (rehiver_spark/functions/png.py) — pure-python, no
Spark session needed. Round-trips, filter reconstruction against
independently-built reference PNGs, color-type expansion, and loud
failures on unsupported/corrupt payloads."""

import struct
import zlib

import numpy as np
import pytest

from rehiver_spark.functions.png import (
    PngError,
    fit_dims,
    is_png,
    png_decode,
    png_encode,
    png_info,
    png_resize,
)


def _ref_png(w, h, ctype, pixels, *, bit_depth=8, plte=None, trns=None, filters=None):
    """Build a PNG independently of png_encode (per-line filter choice)
    so decode is tested against a second implementation, not itself."""
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, ctype, 0, 0, 0)
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    stride = w * ch
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        line = bytes(pixels[y * stride : (y + 1) * stride])
        f = (filters or [0] * h)[y]
        raw.append(f)
        if f == 0:
            raw += line
        elif f == 1:  # Sub
            raw += bytes(
                (line[x] - (line[x - ch] if x >= ch else 0)) & 0xFF
                for x in range(stride)
            )
        elif f == 2:  # Up
            raw += bytes((line[x] - prev[x]) & 0xFF for x in range(stride))
        elif f == 3:  # Average
            raw += bytes(
                (line[x] - (((line[x - ch] if x >= ch else 0) + prev[x]) >> 1)) & 0xFF
                for x in range(stride)
            )
        elif f == 4:  # Paeth

            def paeth(a, b, c):
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

            raw += bytes(
                (
                    line[x]
                    - paeth(
                        line[x - ch] if x >= ch else 0,
                        prev[x],
                        prev[x - ch] if x >= ch else 0,
                    )
                )
                & 0xFF
                for x in range(stride)
            )
        prev = line
    out = sig + chunk(b"IHDR", ihdr)
    if plte is not None:
        out += chunk(b"PLTE", plte)
    if trns is not None:
        out += chunk(b"tRNS", trns)
    return out + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")


def test_roundtrip_rgba():
    rng = np.random.default_rng(7)
    w, h = 13, 9
    px = rng.integers(0, 256, size=w * h * 4, dtype=np.uint8).tobytes()
    b = png_encode(w, h, px)
    assert is_png(b)
    assert png_info(b) == (w, h, 8, 6)
    dw, dh, dpx = png_decode(b)
    assert (dw, dh) == (w, h) and dpx == px


def test_encode_deterministic():
    px = bytes(range(256)) * 4  # 16x16 RGBA
    assert png_encode(16, 16, px) == png_encode(16, 16, px)


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_decode_each_filter_type(filt):
    rng = np.random.default_rng(filt)
    w, h = 7, 5
    px = rng.integers(0, 256, size=w * h * 4, dtype=np.uint8).tobytes()
    ref = _ref_png(w, h, 6, px, filters=[filt] * h)
    dw, dh, dpx = png_decode(ref)
    assert (dw, dh) == (w, h) and dpx == px


def test_decode_color_types_expand_to_rgba():
    # gray
    g = bytes([0, 128, 255, 64])
    _, _, px = png_decode(_ref_png(2, 2, 0, g))
    a = np.frombuffer(px, np.uint8).reshape(2, 2, 4)
    assert (a[..., 0] == a[..., 1]).all() and (a[..., 3] == 255).all()
    assert a[0, 1, 0] == 128
    # rgb
    rgb = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    _, _, px = png_decode(_ref_png(2, 2, 2, rgb))
    a = np.frombuffer(px, np.uint8).reshape(2, 2, 4)
    assert tuple(a[0, 0, :3]) == (255, 0, 0) and (a[..., 3] == 255).all()
    # gray+alpha
    ga = bytes([10, 20, 30, 40])
    _, _, px = png_decode(_ref_png(2, 1, 4, ga))
    a = np.frombuffer(px, np.uint8).reshape(1, 2, 4)
    assert tuple(a[0, 0]) == (10, 10, 10, 20) and tuple(a[0, 1]) == (30, 30, 30, 40)
    # palette + tRNS
    plte = bytes([255, 0, 0, 0, 0, 255])
    idx = bytes([0, 1, 1, 0])
    _, _, px = png_decode(_ref_png(2, 2, 3, idx, plte=plte, trns=bytes([128])))
    a = np.frombuffer(px, np.uint8).reshape(2, 2, 4)
    assert tuple(a[0, 0]) == (255, 0, 0, 128)  # palette 0 has tRNS alpha
    assert tuple(a[0, 1]) == (0, 0, 255, 255)  # palette 1 defaults opaque


def test_fit_dims_never_upscales_and_preserves_aspect():
    assert fit_dims(100, 50, 200) == (100, 50)
    assert fit_dims(400, 100, 200) == (200, 50)
    assert fit_dims(100, 400, 200) == (50, 200)
    assert fit_dims(1000, 1, 10) == (10, 1)  # floor clamps to 1


def test_resize_nearest_neighbor_values():
    # 4x2 image of distinct column colors → 2x1 picks columns 0 and 2
    px = bytes(
        v
        for y in range(2)
        for x in range(4)
        for v in (x * 60, y * 100, 7, 255)
    )
    b = png_encode(4, 2, px)
    sw, sh, w, h, out = png_resize(b, 2)
    assert (sw, sh, w, h) == (4, 2, 2, 1)
    _, _, opx = png_decode(out)
    a = np.frombuffer(opx, np.uint8).reshape(1, 2, 4)
    assert a[0, 0, 0] == 0 and a[0, 1, 0] == 120  # x=0 and x=2 sampled


def test_unsupported_and_corrupt_fail_loudly():
    with pytest.raises(PngError, match="signature"):
        png_info(b"\xff\xd8\xff\xe0 not a png")
    px = bytes(16)
    with pytest.raises(PngError, match="bit depth"):
        png_decode(_ref_png(2, 2, 0, bytes(4), bit_depth=16))
    good = png_encode(2, 2, px)
    bad_crc = bytearray(good)
    bad_crc[-5] ^= 0xFF  # flip a byte inside IEND's CRC
    with pytest.raises(PngError, match="CRC"):
        png_decode(bytes(bad_crc))
    with pytest.raises(PngError, match="pixel buffer"):
        png_encode(3, 3, bytes(4))
    truncated = good[: len(good) - 20]
    with pytest.raises(PngError):
        png_decode(truncated)
