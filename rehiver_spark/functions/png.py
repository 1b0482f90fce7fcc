"""Stdlib-only PNG codec (zlib + struct): decode, encode, resize.

The container has no imaging library, but PNG itself needs nothing
beyond ``zlib`` (RFC 2083 §2: DEFLATE datastream, 5 byte-filters, CRC).
This module gives the multimodal operators a *real* codec path — actual
pixel decode/encode, not a digest-derived fake — so ``fake=False``
executes end-to-end here, with Pillow only needed for non-PNG formats.

Supported: bit depth 8, color types 0 (gray), 2 (RGB), 3 (palette, with
optional tRNS alpha), 4 (gray+alpha), 6 (RGBA); non-interlaced. Other
shapes (16-bit, 1/2/4-bit packed, Adam7) raise :class:`PngError` with
the exact unsupported feature named — a corrupt/unsupported object must
fail loudly per-row, never mis-decode.

Scale note: this runs inside Arrow-batched ``mapInPandas`` kernels.
Unfiltering is per-scanline sequential (the format's data dependency),
vectorized with numpy across each line where the filter allows; the
nearest-neighbor resample is pure numpy fancy-indexing.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    """Malformed or unsupported PNG payload."""


def is_png(payload: bytes) -> bool:
    return payload[:8] == _SIG


def _chunks(b: bytes):
    off = 8
    n = len(b)
    while off + 12 <= n:
        (ln,) = struct.unpack_from(">I", b, off)
        typ = b[off + 4 : off + 8]
        data = b[off + 8 : off + 8 + ln]
        if len(data) != ln:
            raise PngError(f"truncated {typ!r} chunk")
        (crc,) = struct.unpack_from(">I", b, off + 8 + ln)
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise PngError(f"bad CRC in {typ.decode('latin1')} chunk")
        yield typ, data
        off += 12 + ln
        if typ == b"IEND":
            return
    raise PngError("missing IEND chunk")


def png_info(payload: bytes) -> tuple[int, int, int, int]:
    """(width, height, bit_depth, color_type) from IHDR — header-only,
    no inflate; the cheap metadata path for decode_media."""
    if not is_png(payload):
        raise PngError("not a PNG (bad signature)")
    for typ, data in _chunks(payload):
        if typ == b"IHDR":
            if len(data) != 13:
                raise PngError("bad IHDR length")
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if comp or filt:
                raise PngError("bad IHDR compression/filter method")
            if interlace:
                raise PngError("unsupported: Adam7 interlacing")
            if w == 0 or h == 0:
                raise PngError("zero-dimension image")
            return w, h, depth, ctype
        break  # IHDR must be first
    raise PngError("missing IHDR chunk")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, w: int, h: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline byte filters → (h, w*bpp) uint8."""
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise PngError("IDAT size does not match dimensions")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up — vectorizes fully
            cur = (line + prev) & 0xFF
        elif f == 1:  # Sub — sequential in x, vector across channels
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif f == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (cur[x] + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise PngError(f"unknown scanline filter {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def png_decode(payload: bytes) -> tuple[int, int, bytes]:
    """Full pixel decode → (width, height, RGBA bytes, row-major)."""
    w, h, depth, ctype = png_info(payload)
    if depth != 8:
        raise PngError(f"unsupported bit depth {depth} (only 8)")
    if ctype not in _CHANNELS:
        raise PngError(f"unknown color type {ctype}")
    idat = bytearray()
    plte = trns = None
    for typ, data in _chunks(payload):
        if typ == b"IDAT":
            idat += data
        elif typ == b"PLTE":
            plte = data
        elif typ == b"tRNS":
            trns = data
    if not idat:
        raise PngError("missing IDAT chunk")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise PngError(f"bad IDAT deflate stream: {e}") from e

    bpp = _CHANNELS[ctype]
    px = _unfilter(raw, w, h, bpp).reshape(h, w, bpp)
    rgba = np.empty((h, w, 4), dtype=np.uint8)
    if ctype == 6:  # RGBA
        rgba[:] = px
    elif ctype == 2:  # RGB
        rgba[..., :3] = px
        rgba[..., 3] = 255
    elif ctype == 0:  # gray
        rgba[..., :3] = px
        rgba[..., 3] = 255
    elif ctype == 4:  # gray + alpha
        rgba[..., 0] = rgba[..., 1] = rgba[..., 2] = px[..., 0]
        rgba[..., 3] = px[..., 1]
    else:  # palette
        if plte is None:
            raise PngError("palette image missing PLTE chunk")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = px[..., 0]
        if idx.max(initial=0) >= len(pal):
            raise PngError("palette index out of range")
        rgba[..., :3] = pal[idx]
        alpha = np.full(len(pal), 255, dtype=np.uint8)
        if trns is not None:
            t = np.frombuffer(trns, dtype=np.uint8)
            alpha[: len(t)] = t
        rgba[..., 3] = alpha[idx]
    return w, h, rgba.tobytes()


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def png_encode(w: int, h: int, rgba: bytes) -> bytes:
    """RGBA pixels → PNG bytes (color type 6, filter 0, fixed zlib
    level) — byte-deterministic for a given pixel buffer, so resized
    payloads are content-addressable across runs and executors."""
    if len(rgba) != w * h * 4:
        raise PngError(f"pixel buffer is {len(rgba)} bytes, need {w * h * 4}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    arr = np.frombuffer(rgba, dtype=np.uint8).reshape(h, w * 4)
    raw = np.concatenate([np.zeros((h, 1), dtype=np.uint8), arr], axis=1)
    idat = zlib.compress(raw.tobytes(), 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def fit_dims(w: int, h: int, max_side: int) -> tuple[int, int]:
    """Aspect-preserving fit, never upscaling — same pure integer math
    as the fake-codec path so both rails agree on target dims."""
    m = max(w, h)
    if m <= max_side:
        return w, h
    return max(1, w * max_side // m), max(1, h * max_side // m)


def png_resize(payload: bytes, max_side: int) -> tuple[int, int, int, int, bytes]:
    """Decode → nearest-neighbor resample → re-encode.
    Returns (src_w, src_h, w, h, png_bytes)."""
    w, h, rgba = png_decode(payload)
    tw, th = fit_dims(w, h, max_side)
    px = np.frombuffer(rgba, dtype=np.uint8).reshape(h, w, 4)
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    out = px[ys][:, xs]
    return w, h, tw, th, png_encode(tw, th, out.tobytes())
