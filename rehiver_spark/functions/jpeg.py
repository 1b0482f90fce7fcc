"""Lib-free JPEG header parsing (r10 verdict task 6).

The container has no image codec library, so real pixel decode for
JPEG still requires Pillow — but the METADATA the engine needs
(width/height/precision/components) lives in the SOF frame header,
which is plain segment grammar: walk ``FF mm [len16 payload]``
segments from SOI until a start-of-frame marker (SOF0 baseline, SOF2
progressive, and the other non-differential/differential frame types)
and read the dimensions out of its fixed-layout payload (ITU-T T.81
§B.2.2: precision u8, lines u16, samples-per-line u16, components u8).
Same posture as functions/png.py: stdlib-only, deterministic,
validated against Pillow wherever Pillow exists
(tests/test_multimodal_pillow.py).
"""

from __future__ import annotations

# frame-header markers: C0-CF minus DHT (C4), JPG reserved (C8), DAC (CC)
_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}
# standalone markers carry no length field
_STANDALONE = frozenset({0x01, *range(0xD0, 0xD8)})  # TEM, RST0-7


def is_jpeg(b: bytes) -> bool:
    """True for a plausible JPEG stream: SOI then a marker prefix."""
    return len(b) >= 4 and b[0] == 0xFF and b[1] == 0xD8 and b[2] == 0xFF


def jpeg_info(b: bytes) -> tuple[int, int, int, int]:
    """(width, height, bit_precision, n_components) from the first SOF
    frame header. Raises ValueError on non-JPEG input, truncated or
    malformed segment structure, a scan (SOS) or EOI reached before
    any SOF, or a DNL-deferred height (lines == 0), which this parser
    does not chase."""
    if not is_jpeg(b):
        raise ValueError("not a JPEG stream (missing SOI marker)")
    i, n = 2, len(b)
    while i < n:
        if b[i] != 0xFF:
            raise ValueError(f"bad marker prefix 0x{b[i]:02x} at offset {i}")
        while i < n and b[i] == 0xFF:  # fill bytes are legal padding
            i += 1
        if i >= n:
            break
        m = b[i]
        i += 1
        if m in _STANDALONE:
            continue
        if m == 0xD9:  # EOI
            break
        if i + 2 > n:
            raise ValueError("truncated segment length")
        seglen = (b[i] << 8) | b[i + 1]
        if seglen < 2 or i + seglen > n:
            raise ValueError(f"bad segment length {seglen} at offset {i}")
        if m in _SOF_MARKERS:
            if seglen < 8:
                raise ValueError(f"SOF segment too short ({seglen})")
            precision = b[i + 2]
            height = (b[i + 3] << 8) | b[i + 4]
            width = (b[i + 5] << 8) | b[i + 6]
            ncomp = b[i + 7]
            if height == 0:
                raise ValueError("DNL-deferred height (lines == 0) unsupported")
            if width == 0 or ncomp == 0:
                raise ValueError("SOF declares zero width or zero components")
            return width, height, precision, ncomp
        if m == 0xDA:  # SOS: entropy-coded data follows; SOF must precede it
            raise ValueError("scan data reached before any SOF marker")
        i += seglen
    raise ValueError("no SOF marker found")


def minimal_jpeg(
    width: int, height: int, progressive: bool = False, ncomp: int = 3
) -> bytes:
    """Minimal structurally-valid JPEG HEADER stream for fixtures:
    SOI → APP0/JFIF → SOF0 (or SOF2 when ``progressive``) → EOI.

    This is a header-grammar fixture (what :func:`jpeg_info` and the
    metadata decode path consume), NOT a pixel-decodable image — it
    carries no quant/Huffman tables or scan. Pixel-level JPEG work
    stays Pillow-gated; wherever Pillow exists the parser is instead
    validated against real Pillow-encoded JPEGs.
    """
    if not (0 < width < 65536 and 0 < height < 65536 and 0 < ncomp < 256):
        raise ValueError(f"invalid fixture dims {width}x{height}x{ncomp}")
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x02\x00" + bytes(
        [0, 1, 0, 1, 0, 0]
    )
    comps = b"".join(
        bytes([cid + 1, 0x11, 0]) for cid in range(ncomp)
    )  # id, 1x1 sampling, quant table 0
    sof_payload = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big") + bytes([ncomp]) + comps
    marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    sof = marker + (len(sof_payload) + 2).to_bytes(2, "big") + sof_payload
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"
