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


# ---------------------------------------------------------------------------
# Baseline pixel codec (r10 verdict stretch task 8): decode + minimal
# encode for SOF0 sequential 8-bit JPEG, stdlib + numpy only — the
# functions/png.py posture extended to JPEG so the multimodal pixel
# tier (decode → resample → re-encode) runs lib-free end to end.
#
# Scope: the DECODER handles what baseline cameras/encoders emit —
# 1- or 3-component SOF0, 8/16-bit DQT, per-file Huffman tables (read
# from DHT, never assumed), arbitrary integer sampling factors,
# restart intervals, byte stuffing — AND (r12, decode_jpeg) full
# PROGRESSIVE (SOF2) streams: spectral-selection and successive-
# approximation DC/AC scans incl. both refinement protocols (T.81
# G.1.2). Arithmetic coding, 12-bit precision, lossless/hierarchical,
# and CMYK raise informative errors. The ENCODER emits 4:4:4 SOF0
# (encode_baseline) or a SOF2 scan script covering every progressive
# decode path (encode_progressive) with simple PROVABLY-VALID
# canonical Huffman tables (all DC symbols at 4 bits, all AC symbols
# at 8 bits — legal per T.81, suboptimal compression) and a mild
# parametric quant table; every table it writes travels in the
# stream, so any spec-compliant decoder (including this one and
# Pillow, cross-checked in tests/test_multimodal_pillow.py) reads it
# back. Progressive restart intervals decode but are never emitted.
#
# Python does the entropy coding coefficient-by-coefficient; the DCT
# runs as one numpy tensordot over all blocks. Fine for the test/
# reference tier this is — a production 100 TB image pipeline swaps a
# codec library into the same mapInPandas slot (multimodal.py).
# ---------------------------------------------------------------------------

_ZIGZAG = [  # zigzag index -> natural (row-major) index
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _dct_matrix():
    import math

    import numpy as np

    c = np.zeros((8, 8))
    for u in range(8):
        a = math.sqrt(0.125) if u == 0 else math.sqrt(0.25)
        for x in range(8):
            c[u, x] = a * math.cos((2 * x + 1) * u * math.pi / 16)
    return c


class _BitReader:
    """MSB-first bit reader over a DE-STUFFED entropy segment."""

    __slots__ = ("b", "i", "acc", "n")

    def __init__(self, b: bytes):
        self.b = b
        self.i = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.i >= len(self.b):
                raise ValueError("entropy data exhausted mid-block")
            self.acc = self.b[self.i]
            self.i += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _build_huff(bits: list[int], vals: bytes) -> dict:
    """(length, code) -> symbol from the canonical DHT description."""
    table = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[vi]
            vi += 1
            code += 1
        code <<= 1
    return table


def _huffdecode(r: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _entropy_segments(b: bytes, i: int) -> tuple[list[bytes], int]:
    """(de-stuffed entropy intervals from offset ``i``, split at RST
    markers and ending at the first non-RST marker; offset of that
    terminating marker's 0xFF — where the segment walk resumes)."""
    segs, cur, n = [], bytearray(), len(b)
    while i < n:
        x = b[i]
        if x == 0xFF:
            # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
            # marker — skip the run and dispatch on the first non-FF
            # byte (a lone trailing run reads as EOI).
            j = i + 1
            while j < n and b[j] == 0xFF:
                j += 1
            nxt = b[j] if j < n else 0xD9
            if nxt == 0x00:  # stuffed data byte (any leading FFs = fill)
                cur.append(0xFF)
                i = j + 1
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn: segment boundary
                segs.append(bytes(cur))
                cur = bytearray()
                i = j + 1
                continue
            break  # EOI or another segment marker
        cur.append(x)
        i += 1
    segs.append(bytes(cur))
    return segs, i


def decode_baseline(b: bytes):
    """Decode a BASELINE (SOF0, 8-bit) JPEG to
    ``(width, height, ncomp, numpy uint8 array (h, w[, 3]))``.

    Grayscale returns (h, w); 3-component YCbCr converts to RGB per
    JFIF/BT.601. Raises ValueError with the reason for anything outside
    the baseline tier (progressive, arithmetic, 12-bit, CMYK).
    :func:`decode_jpeg` additionally decodes progressive (SOF2)
    streams."""
    return decode_jpeg(b, allow_progressive=False)


def decode_jpeg(b: bytes, allow_progressive: bool = True):
    """Decode a baseline (SOF0/SOF1), progressive (SOF2, r12) or
    arithmetic-coded sequential (SOF9, r13 — functions/jpeg_arith.py)
    8-bit JPEG to ``(width, height, ncomp, numpy uint8 array)``.

    Progressive streams are accumulated scan by scan into per-component
    coefficient stores (DC/AC first scans and both successive-
    approximation refinement protocols, T.81 G.1.2), then reconstructed
    through the same dequantize→IDCT→upsample→color path as baseline.
    Arithmetic PROGRESSIVE (SOF10), 12-bit precision, lossless,
    hierarchical and CMYK still raise informative errors."""
    import numpy as np

    if not is_jpeg(b):
        raise ValueError("not a JPEG stream (missing SOI marker)")
    qt: dict[int, "np.ndarray"] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (precision, h, w, [(cid, hs, vs, tq)])
    progressive = False
    arithmetic = False
    dc_cond: dict[int, tuple[int, int]] = {}  # DAC: DC table -> (L, U)
    ac_cond: dict[int, int] = {}  # DAC: AC table -> Kx
    pstate = None  # progressive accumulation state (set at first SOS)
    dri = 0
    i, n = 2, len(b)
    while i < n:
        if b[i] != 0xFF:
            raise ValueError(f"bad marker prefix 0x{b[i]:02x} at offset {i}")
        while i < n and b[i] == 0xFF:
            i += 1
        if i >= n:
            break
        m = b[i]
        i += 1
        if m in _STANDALONE:
            continue
        if m == 0xD9:
            break
        if i + 2 > n:
            raise ValueError("truncated segment length")
        seglen = (b[i] << 8) | b[i + 1]
        if seglen < 2 or i + seglen > n:
            raise ValueError(f"bad segment length {seglen} at offset {i}")
        p, end = i + 2, i + seglen
        if m == 0xDB:  # DQT
            while p < end:
                pq, tq = b[p] >> 4, b[p] & 15
                p += 1
                cnt = 64 * (2 if pq else 1)
                if p + cnt > end:
                    raise ValueError("truncated DQT")
                raw = (
                    np.frombuffer(b[p:p + 128], dtype=">u2").astype(np.int64)
                    if pq
                    else np.frombuffer(b[p:p + 64], dtype=np.uint8).astype(np.int64)
                )
                t = np.zeros(64, dtype=np.int64)
                t[_ZIGZAG] = raw  # de-zigzag into natural order
                qt[tq] = t.reshape(8, 8)
                p += cnt
        elif m == 0xC4:  # DHT
            while p < end:
                tc, th = b[p] >> 4, b[p] & 15
                if p + 17 > end:
                    raise ValueError("truncated DHT")
                counts = list(b[p + 1:p + 17])
                nv = sum(counts)
                vals = b[p + 17:p + 17 + nv]
                if p + 17 + nv > end or len(vals) < nv:
                    raise ValueError("truncated DHT")
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huff(counts, vals)
                p += 17 + nv
        elif m == 0xCC:  # DAC: arithmetic conditioning (B.2.4.3)
            while p < end - 1:
                tc, tb = b[p] >> 4, b[p] & 15
                cs = b[p + 1]
                if tc == 0:
                    dc_cond[tb] = (cs & 15, cs >> 4)  # (L, U)
                else:
                    ac_cond[tb] = cs  # Kx
                p += 2
        elif m in _SOF_MARKERS:
            if m == 0xC2 and allow_progressive:
                progressive = True
            elif m == 0xC9 and allow_progressive:
                # arithmetic sequential (jpeg_arith, r13); gated with
                # progressive so decode_baseline keeps its contract
                arithmetic = True
            elif m != 0xC0 and m != 0xC1:  # extended sequential C1 is ok
                kind = {
                    0xC2: "progressive",
                    0xC3: "lossless",
                    0xC9: "arithmetic",
                    0xCA: "arithmetic progressive",
                }.get(m, f"SOF{m - 0xC0}")
                raise ValueError(f"{kind} JPEG not supported (baseline only)")
            prec, hh, ww, nc = b[p], (b[p + 1] << 8) | b[p + 2], (
                b[p + 3] << 8
            ) | b[p + 4], b[p + 5]
            if prec != 8:
                raise ValueError(f"{prec}-bit precision not supported")
            if hh == 0 or ww == 0:
                raise ValueError("DNL-deferred or zero dimensions unsupported")
            if nc not in (1, 3):
                raise ValueError(f"{nc}-component JPEG (CMYK?) not supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = b[p + 6 + 3 * c], b[p + 7 + 3 * c], b[p + 8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (prec, hh, ww, comps)
        elif m == 0xDD:  # DRI
            dri = (b[p] << 8) | b[p + 1]
        elif m == 0xDA:  # SOS
            if frame is None:
                raise ValueError("scan data reached before any SOF marker")
            ns = b[p]
            scan = []  # (comp_idx, dc_table, ac_table)
            for s in range(ns):
                cs, tt = b[p + 1 + 2 * s], b[p + 2 + 2 * s]
                idx = next(
                    (k for k, c in enumerate(frame[3]) if c[0] == cs), None
                )
                if idx is None:
                    raise ValueError(f"SOS names unknown component {cs}")
                scan.append((idx, tt >> 4, tt & 15))
            if arithmetic:
                if len(scan) != len(frame[3]):
                    raise ValueError("non-interleaved scans not supported")
                from rehiver_spark.functions.jpeg_arith import (
                    decode_scan_arith,
                )

                return decode_scan_arith(
                    b, end, frame, scan, qt, dri, dc_cond, ac_cond
                )
            if not progressive:
                if len(scan) != len(frame[3]):
                    raise ValueError("non-interleaved scans not supported")
                return _decode_scan(
                    b, end, frame, scan, qt, huff_dc, huff_ac, dri
                )
            ss, se = b[p + 1 + 2 * ns], b[p + 2 + 2 * ns]
            ahal = b[p + 3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            if pstate is None:
                pstate = _ProgressiveState(frame)
            pstate.snapshot_qt(frame, scan, qt)
            i = _progressive_scan(
                b, end, frame, scan, ss, se, ah, al,
                huff_dc, huff_ac, dri, pstate,
            )
            continue  # i already points at the terminating marker
        i += seglen
    if progressive and pstate is not None:
        # scan-time snapshots win over later DQT segments (see snapshot_qt)
        return _reconstruct(
            frame, pstate.blocks, {**qt, **pstate.qt_snap}, pstate.mcux, pstate.mcuy
        )
    raise ValueError("no SOS scan found")


def _decode_scan(b, data_start, frame, scan, qt, huff_dc, huff_ac, dri):
    import numpy as np

    _, h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    n_mcu = mcux * mcuy
    segs, _end = _entropy_segments(b, data_start)
    # per component: coefficient store (n_blocks, 8, 8) in MCU order
    blocks = [
        np.zeros((mcuy * c[2] * mcux * c[1], 8, 8), dtype=np.int64)
        for c in comps
    ]
    preds = [0] * len(comps)
    seg_i = 0
    r = _BitReader(segs[0])
    for mcu in range(n_mcu):
        if dri and mcu and mcu % dri == 0:  # restart: next interval
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("missing restart interval data")
            r = _BitReader(segs[seg_i])
            preds = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, tdc, tac in scan:
            _, hs, vs, _tq = comps[ci]
            dct = huff_dc.get(tdc)
            act = huff_ac.get(tac)
            if dct is None or act is None:
                raise ValueError("scan references undefined Huffman table")
            for v in range(vs):
                for hh in range(hs):
                    coef = np.zeros(64, dtype=np.int64)
                    s = _huffdecode(r, dct)
                    if s > 11:
                        raise ValueError("DC category > 11 in 8-bit baseline")
                    diff = _extend(r.bits(s), s) if s else 0
                    preds[ci] += diff
                    coef[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = _huffdecode(r, act)
                        rr, ss = rs >> 4, rs & 15
                        if ss == 0:
                            if rr == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += rr
                        if k > 63:
                            raise ValueError("AC run past block end")
                        coef[_ZIGZAG[k]] = _extend(r.bits(ss), ss)
                        k += 1
                    row = (my * vs + v) * (mcux * hs) + (mx * hs + hh)
                    blocks[ci][row] = coef.reshape(8, 8)
    return _reconstruct(frame, blocks, qt, mcux, mcuy)


def _reconstruct(frame, blocks, qt, mcux, mcuy):
    """Dequantize + IDCT + upsample + color-convert a list of per-
    component coefficient stores (MCU-padded layout) — shared by the
    baseline single-scan path and the progressive accumulator."""
    import numpy as np

    _, h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    C = _dct_matrix()
    planes = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        if tq not in qt:
            raise ValueError(f"component {cid} references undefined DQT {tq}")
        deq = blocks[ci].astype(np.float64) * qt[tq][None, :, :]
        spat = np.einsum("ux,nuv,vy->nxy", C, deq, C) + 128.0
        bw, bh = mcux * hs, mcuy * vs  # blocks per row / column
        plane = (
            spat.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        # map full-res pixels to this component's samples (T.81 A.1.1)
        ys = (np.arange(h) * vs) // vmax
        xs = (np.arange(w) * hs) // hmax
        planes.append(plane[np.ix_(ys, xs)])
    if len(planes) == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return w, h, 1, out
    y, cb, cr = planes
    rgb = np.stack(
        [
            y + 1.402 * (cr - 128.0),
            y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
            y + 1.772 * (cb - 128.0),
        ],
        axis=-1,
    )
    return w, h, 3, np.clip(np.round(rgb), 0, 255).astype(np.uint8)


class _ProgressiveState:
    """Cross-scan accumulation for a progressive frame: one MCU-padded
    coefficient store per component (same layout as the baseline
    path's) plus the MCU grid dims."""

    __slots__ = ("blocks", "mcux", "mcuy", "hmax", "vmax", "qt_snap")

    def __init__(self, frame):
        import numpy as np

        _, h, w, comps = frame
        self.hmax = max(c[1] for c in comps)
        self.vmax = max(c[2] for c in comps)
        self.mcux = -(-w // (8 * self.hmax))
        self.mcuy = -(-h // (8 * self.vmax))
        self.blocks = [
            np.zeros((self.mcuy * c[2] * self.mcux * c[1], 8, 8), dtype=np.int64)
            for c in comps
        ]
        # quant tables as of each table's FIRST scan use (T.81: tables
        # in effect at scan time govern; we dequantize once at EOI, so
        # snapshot here and reject mid-stream redefinitions — r12 ADVICE)
        self.qt_snap: dict[int, "np.ndarray"] = {}

    def snapshot_qt(self, frame, scan, qt):
        import numpy as np

        for ci, _tdc, _tac in scan:
            tq = frame[3][ci][3]
            if tq not in qt:
                continue  # missing table surfaces at reconstruct time
            if tq in self.qt_snap:
                if not np.array_equal(self.qt_snap[tq], qt[tq]):
                    raise ValueError(
                        f"DQT {tq} redefined between progressive scans — "
                        "dequantization happens once at EOI, so per-scan "
                        "table changes are not supported (T.81 scan-time "
                        "tables govern)"
                    )
            else:
                self.qt_snap[tq] = qt[tq].copy()


def _comp_block_dims(frame, ci, pstate):
    """Non-interleaved block grid for one component (T.81 A.2.2):
    ceil(comp samples / 8) per axis — NOT the MCU-padded store width
    (``mcux*hs``), which can exceed it by sampling padding."""
    _, h, w, comps = frame
    _, hs, vs, _ = comps[ci]
    cw = -(-w * hs // pstate.hmax)
    ch = -(-h * vs // pstate.vmax)
    return -(-cw // 8), -(-ch // 8)


def _progressive_scan(
    b, data_start, frame, scan, ss, se, ah, al, huff_dc, huff_ac, dri, pstate
):
    """Decode ONE progressive scan (T.81 G.1.2) into ``pstate.blocks``;
    returns the stream offset of the scan's terminating marker.

    Covers all four scan kinds: DC first (Ah=0, interleaved or single-
    component), DC refinement (one bit per block), AC first (EOB-run
    coding, single component), AC refinement (correction-bit protocol,
    G.1.2.3). Restart intervals reset DC predictors and the EOB run."""
    import numpy as np  # noqa: F401  (layout parity with the callers)

    segs, end = _entropy_segments(b, data_start)
    comps = frame[3]
    zz = _ZIGZAG
    if ss == 0:  # DC scan (Se must be 0 per T.81)
        if se != 0:
            raise ValueError("DC progressive scan with Se != 0")
        dc_tables = {}
        for ci, tdc, _tac in scan:
            t = huff_dc.get(tdc)
            if t is None and ah == 0:
                raise ValueError("scan references undefined Huffman table")
            dc_tables[ci] = t
        seg_i = 0
        r = _BitReader(segs[0])
        preds = {ci: 0 for ci, _, _ in scan}
        if len(scan) > 1:  # interleaved over MCUs
            n_mcu = pstate.mcux * pstate.mcuy
            for mcu in range(n_mcu):
                if dri and mcu and mcu % dri == 0:
                    seg_i += 1
                    if seg_i >= len(segs):
                        raise ValueError("missing restart interval data")
                    r = _BitReader(segs[seg_i])
                    preds = {ci: 0 for ci, _, _ in scan}
                my, mx = divmod(mcu, pstate.mcux)
                for ci, _tdc, _tac in scan:
                    _, hs, vs, _tq = comps[ci]
                    for v in range(vs):
                        for hh in range(hs):
                            row = (my * vs + v) * (pstate.mcux * hs) + (
                                mx * hs + hh
                            )
                            _dc_data_unit(
                                r, pstate.blocks[ci], row, dc_tables[ci],
                                preds, ci, ah, al,
                            )
        else:  # single-component DC scan: component block raster order
            ci = scan[0][0]
            _, hs, vs, _tq = comps[ci]
            cbw, cbh = _comp_block_dims(frame, ci, pstate)
            unit = 0
            for by in range(cbh):
                for bx in range(cbw):
                    if dri and unit and unit % dri == 0:
                        seg_i += 1
                        if seg_i >= len(segs):
                            raise ValueError("missing restart interval data")
                        r = _BitReader(segs[seg_i])
                        preds = {ci: 0}
                    row = by * (pstate.mcux * hs) + bx
                    _dc_data_unit(
                        r, pstate.blocks[ci], row, dc_tables[ci],
                        preds, ci, ah, al,
                    )
                    unit += 1
        return end
    # AC scan: exactly one component (T.81 B.2.3)
    if len(scan) != 1:
        raise ValueError("progressive AC scan must have one component")
    ci, _tdc, tac = scan[0]
    act = huff_ac.get(tac)
    if act is None:
        raise ValueError("scan references undefined Huffman table")
    _, hs, vs, _tq = comps[ci]
    cbw, cbh = _comp_block_dims(frame, ci, pstate)
    blocks = pstate.blocks[ci]
    seg_i = 0
    r = _BitReader(segs[0])
    eobrun = 0
    unit = 0
    for by in range(cbh):
        for bx in range(cbw):
            if dri and unit and unit % dri == 0:
                seg_i += 1
                if seg_i >= len(segs):
                    raise ValueError("missing restart interval data")
                r = _BitReader(segs[seg_i])
                eobrun = 0
            row = by * (pstate.mcux * hs) + bx
            coef = blocks[row].reshape(64)
            if ah == 0:
                eobrun = _ac_first_unit(r, coef, act, ss, se, al, eobrun, zz)
            else:
                eobrun = _ac_refine_unit(r, coef, act, ss, se, al, eobrun, zz)
            unit += 1
    return end


def _dc_data_unit(r, blocks, row, dct, preds, ci, ah, al):
    """One block's DC contribution: first scan (Ah=0) decodes the DPCM
    difference of DC>>Al; refinement appends bit Al (two's-complement
    OR reconstructs negatives exactly)."""
    coef = blocks[row].reshape(64)
    if ah == 0:
        s = _huffdecode(r, dct)
        if s > 11:
            raise ValueError("DC category > 11 in 8-bit scan")
        diff = _extend(r.bits(s), s) if s else 0
        preds[ci] += diff
        coef[0] = preds[ci] << al
    else:
        if r.bit():
            coef[0] = int(coef[0]) | (1 << al)


def _ac_first_unit(r, coef, act, ss, se, al, eobrun, zz):
    """AC first scan for one block (T.81 G.1.2.2): EOB-run aware."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huffdecode(r, act)
        rr, s = rs >> 4, rs & 15
        if s == 0:
            if rr < 15:  # EOBn: run of 2^rr + ext bits, this block incl.
                eobrun = (1 << rr) - 1
                if rr:
                    eobrun += r.bits(rr)
                return eobrun
            k += 16  # ZRL
            continue
        k += rr
        if k > se:
            raise ValueError("AC run past spectral band end")
        coef[zz[k]] = _extend(r.bits(s), s) << al
        k += 1
    return 0


def _ac_refine_unit(r, coef, act, ss, se, al, eobrun, zz):
    """AC refinement for one block (T.81 G.1.2.3): newly-significant
    coefficients arrive as ±1<<Al; already-significant ones receive a
    correction bit whenever the scan passes them."""
    p1 = 1 << al
    k = ss

    def correct(z):
        cv = int(coef[z])
        if r.bit() and (cv & p1) == 0:
            coef[z] = cv + (p1 if cv >= 0 else -p1)

    if eobrun == 0:
        while k <= se:
            rs = _huffdecode(r, act)
            rr, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if rr < 15:  # EOBn
                    eobrun = 1 << rr
                    if rr:
                        eobrun += r.bits(rr)
                    break
                # ZRL: rr stays 15 → pass 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("AC refinement size > 1")
                val = p1 if r.bit() else -p1
            while k <= se:
                z = zz[k]
                if coef[z] != 0:
                    correct(z)
                else:
                    if rr == 0:
                        break
                    rr -= 1
                k += 1
            if val and k <= se:
                coef[zz[k]] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            z = zz[k]
            if coef[z] != 0:
                correct(z)
            k += 1
        eobrun -= 1
    return eobrun


class _BitWriter:
    """MSB-first bit writer with 0xFF byte stuffing (T.81 B.1.1.5)."""

    __slots__ = ("out", "acc", "n")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for k in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> k) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s
        return bytes(self.out)


def _enc_tables():
    """Simple PROVABLY-VALID canonical Huffman tables for the encoder:
    every DC category (0-11) at 4 bits (Kraft 12/16), every AC (run,
    size) symbol at 8 bits (Kraft 162/256). Legal per T.81, ~15-30%
    bigger files than Annex K tables — they travel in the DHT segment,
    so any compliant decoder reads them back; nothing downstream
    assumes them."""
    dc_counts = [0, 0, 0, 12] + [0] * 12
    dc_vals = bytes(range(12))
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    ac_counts = [0] * 7 + [len(ac_syms)] + [0] * 8
    ac_vals = bytes(ac_syms)
    def codes(counts, vals):
        enc = {}
        code = 0
        vi = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                enc[vals[vi]] = (code, length)
                vi += 1
                code += 1
            code <<= 1
        return enc
    return (
        (dc_counts, dc_vals, codes(dc_counts, dc_vals)),
        (ac_counts, ac_vals, codes(ac_counts, ac_vals)),
    )


def _quant_table(quality: int):
    """Mild parametric quant table (frequency-proportional, clamped to
    [1, 255]): quality 100 → all-ones (DCT roundoff only), lower
    quality scales linearly. Deliberately simple and deterministic —
    NOT Annex K; it travels in the DQT segment like any custom table."""
    import numpy as np

    q = max(1, min(100, int(quality)))
    s = (100 - q) / 50.0  # 0.0 at q=100, 1.0 at q=50
    u = np.arange(8)
    base = 1.0 + (u[:, None] + u[None, :]) * 2.0 * s
    return np.clip(np.round(base), 1, 255).astype(np.int64)


def _quantized_blocks(arr, quality: int):
    """Shared encoder front half: validate, color-convert, pad, DCT and
    quantize. Returns ``(h, w, nc, q, qblocks)`` with one
    zigzag-ordered (n_blocks, 64) int64 array per component in 4:4:4
    block raster order — encode_baseline and encode_progressive consume
    the SAME coefficients, so their decoded pixels are bit-identical
    (test-pinned)."""
    import numpy as np

    a = np.asarray(arr)
    if a.dtype != np.uint8 or a.ndim not in (2, 3) or (
        a.ndim == 3 and a.shape[2] != 3
    ):
        raise ValueError("encoder wants uint8 (h, w) or (h, w, 3)")
    h, w = a.shape[:2]
    if not (0 < w < 65536 and 0 < h < 65536):
        raise ValueError(f"dims out of range: {w}x{h}")
    if a.ndim == 2:
        planes = [a.astype(np.float64)]
    else:
        r, g, bl = (a[..., k].astype(np.float64) for k in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * bl,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * bl,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * bl,
        ]
    q = _quant_table(quality)
    C = _dct_matrix()
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    zz = np.asarray(_ZIGZAG)
    qblocks = []
    for p in planes:
        padded = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") - 128.0
        blk = (
            padded.reshape(ph // 8, 8, pw // 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
        )
        dct = np.einsum("ux,nxy,vy->nuv", C, blk, C)
        qb = np.round(dct / q[None, :, :]).astype(np.int64)
        qblocks.append(qb.reshape(-1, 64)[:, zz])  # zigzag-ordered rows
    return h, w, len(planes), q, qblocks


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _header_segments(h, w, nc, q, sof_marker: int) -> bytes:
    """DQT + SOFn for the shared 4:4:4 8-bit encoder frame."""
    import numpy as np

    zz = np.asarray(_ZIGZAG)
    dqt = _seg(0xDB, bytes([0x00]) + bytes(int(x) for x in q.reshape(-1)[zz]))
    sof = _seg(
        sof_marker,
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([nc]) + b"".join(bytes([c + 1, 0x11, 0]) for c in range(nc)),
    )
    return dqt + sof


def encode_baseline(arr, quality: int = 92) -> bytes:
    """Encode a numpy uint8 array — (h, w) grayscale or (h, w, 3) RGB —
    as a baseline 4:4:4 SOF0 JPEG (see the codec banner above)."""
    h, w, nc, q, qblocks = _quantized_blocks(arr, quality)
    (dc_counts, dc_vals, dc_enc), (ac_counts, ac_vals, ac_enc) = _enc_tables()
    bw = _BitWriter()
    preds = [0] * nc
    for bi in range(qblocks[0].shape[0]):
        for ci in range(nc):
            coef = qblocks[ci][bi]
            diff = int(coef[0]) - preds[ci]
            preds[ci] = int(coef[0])
            s = abs(diff).bit_length()
            code, length = dc_enc[s]
            bw.write(code, length)
            if s:
                bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
            run = 0
            for k in range(1, 64):
                v = int(coef[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_enc[0xF0]
                    bw.write(code, length)
                    run -= 16
                s = abs(v).bit_length()
                code, length = ac_enc[(run << 4) | s]
                bw.write(code, length)
                bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if run:
                code, length = ac_enc[0x00]  # EOB
                bw.write(code, length)
    data = bw.flush()
    dht = _seg(0xC4, bytes([0x00]) + bytes(dc_counts) + dc_vals) + _seg(
        0xC4, bytes([0x10]) + bytes(ac_counts) + ac_vals
    )
    sos = _seg(
        0xDA,
        bytes([nc]) + b"".join(bytes([c + 1, 0x00]) for c in range(nc))
        + bytes([0, 63, 0]),
    )
    return (
        b"\xff\xd8" + _header_segments(h, w, nc, q, 0xC0) + dht + sos
        + data + b"\xff\xd9"
    )


def _enc_tables_progressive():
    """Progressive AC table = the baseline 8-bit scheme plus the EOBn
    symbols (r<<4, r=1..14) that code EOB runs (T.81 G.1.2.2): 176
    symbols at 8 bits, Kraft 176/256 — still provably valid."""
    dc, (_, _, _) = _enc_tables()
    ac_syms = (
        [0x00, 0xF0]
        + [r << 4 for r in range(1, 15)]
        + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    )
    ac_counts = [0] * 7 + [len(ac_syms)] + [0] * 8
    ac_vals = bytes(ac_syms)
    enc = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(ac_counts[length - 1]):
            enc[ac_vals[vi]] = (code, length)
            vi += 1
            code += 1
        code <<= 1
    return dc, (ac_counts, ac_vals, enc)


def encode_progressive(arr, quality: int = 92) -> bytes:
    """Encode a numpy uint8 array as a PROGRESSIVE 4:4:4 SOF2 JPEG
    (r12 stretch): the same :func:`_quantized_blocks` coefficients as
    :func:`encode_baseline` — decoded pixels are bit-identical,
    test-pinned — split into a scan script that exercises every
    progressive decode path:

    1. DC first, interleaved, Al=1 (successive approximation)
    2. DC refinement, Ah=1→Al=0 (one bit per block)
    3. per component: AC first, Ss=1..63, Al=1 (EOB-run coding)
    4. per component: AC refinement, Ah=1→Al=0 (correction bits,
       T.81 G.1.2.3 — the encoder mirror of :func:`_ac_refine_unit`)
    """
    h, w, nc, q, qblocks = _quantized_blocks(arr, quality)
    (dc_counts, dc_vals, dc_enc), (ac_counts, ac_vals, ac_enc) = (
        _enc_tables_progressive()
    )
    n_blocks = qblocks[0].shape[0]

    def sos_header(comp_ids, ss, se, ah, al):
        return _seg(
            0xDA,
            bytes([len(comp_ids)])
            + b"".join(bytes([cid, 0x00]) for cid in comp_ids)
            + bytes([ss, se, (ah << 4) | al]),
        )

    out = bytearray(b"\xff\xd8")
    out += _header_segments(h, w, nc, q, 0xC2)
    out += _seg(0xC4, bytes([0x00]) + bytes(dc_counts) + dc_vals)
    out += _seg(0xC4, bytes([0x10]) + bytes(ac_counts) + ac_vals)

    # --- scan 1: DC first, interleaved, Al=1 -------------------------
    bw = _BitWriter()
    preds = [0] * nc
    for bi in range(n_blocks):
        for ci in range(nc):
            v1 = int(qblocks[ci][bi][0]) >> 1  # arithmetic point transform
            diff = v1 - preds[ci]
            preds[ci] = v1
            s = abs(diff).bit_length()
            code, length = dc_enc[s]
            bw.write(code, length)
            if s:
                bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    out += sos_header(list(range(1, nc + 1)), 0, 0, 0, 1) + bw.flush()

    # --- scan 2: DC refinement, Ah=1 Al=0 (bit 0 per block) ----------
    bw = _BitWriter()
    for bi in range(n_blocks):
        for ci in range(nc):
            bw.write(int(qblocks[ci][bi][0]) & 1, 1)
    out += sos_header(list(range(1, nc + 1)), 0, 0, 1, 0) + bw.flush()

    # --- scans 3..: per-component AC first, Al=1 ---------------------
    def flush_eobrun(bw, eobrun, be_bits):
        if eobrun:
            rb = eobrun.bit_length() - 1
            code, length = ac_enc[rb << 4]
            bw.write(code, length)
            if rb:
                bw.write(eobrun - (1 << rb), rb)
            for bit in be_bits:
                bw.write(bit, 1)
            be_bits.clear()
        return 0

    for ci in range(nc):
        bw = _BitWriter()
        eobrun = 0
        be: list[int] = []  # no correction bits exist in first scans
        for bi in range(n_blocks):
            coef = qblocks[ci][bi]
            run = 0
            emitted = False
            for k in range(1, 64):
                v = int(coef[k])
                t = abs(v) >> 1
                if t == 0:
                    run += 1
                    continue
                eobrun = flush_eobrun(bw, eobrun, be)
                while run > 15:
                    code, length = ac_enc[0xF0]
                    bw.write(code, length)
                    run -= 16
                s = t.bit_length()
                code, length = ac_enc[(run << 4) | s]
                bw.write(code, length)
                tv = t if v > 0 else -t
                bw.write(tv if tv >= 0 else tv + (1 << s) - 1, s)
                run = 0
                emitted = True
            if run or not emitted:
                eobrun += 1
                if eobrun == 32767:
                    eobrun = flush_eobrun(bw, eobrun, be)
        flush_eobrun(bw, eobrun, be)
        out += sos_header([ci + 1], 1, 63, 0, 1) + bw.flush()

    # --- scans ..: per-component AC refinement, Ah=1 Al=0 ------------
    for ci in range(nc):
        bw = _BitWriter()
        eobrun = 0
        be = []  # correction bits riding with the pending EOB run
        for bi in range(n_blocks):
            coef = qblocks[ci][bi]
            # last newly-significant index: ZRLs are only legal before it
            k_eob = 0
            for k in range(1, 64):
                if abs(int(coef[k])) == 1:
                    k_eob = k
            run = 0
            br: list[int] = []  # corrections since the last symbol
            for k in range(1, 64):
                v = int(coef[k])
                m = abs(v)
                if m == 0:
                    run += 1
                    continue
                if k <= k_eob:
                    while run > 15:
                        eobrun = flush_eobrun(bw, eobrun, be)
                        code, length = ac_enc[0xF0]
                        bw.write(code, length)
                        run -= 16
                        for bit in br:
                            bw.write(bit, 1)
                        br = []
                if m > 1:  # history-significant: correction bit
                    br.append(m & 1)
                    continue
                # newly significant (|v| == 1)
                eobrun = flush_eobrun(bw, eobrun, be)
                code, length = ac_enc[(run << 4) | 1]
                bw.write(code, length)
                bw.write(1 if v > 0 else 0, 1)  # sign bit
                for bit in br:
                    bw.write(bit, 1)
                br = []
                run = 0
            if run or br:  # tail folds into the EOB run
                eobrun += 1
                be.extend(br)
                if eobrun == 32767:
                    eobrun = flush_eobrun(bw, eobrun, be)
        flush_eobrun(bw, eobrun, be)
        out += sos_header([ci + 1], 1, 63, 1, 0) + bw.flush()

    out += b"\xff\xd9"
    return bytes(out)


def jpeg_resize(b: bytes, max_side: int):
    """Decode (baseline, progressive r12, OR arithmetic sequential
    r13) → aspect-preserving nearest-neighbor resample (shared
    ``png.fit_dims`` integer math, never upscales) → deterministic
    baseline re-encode. Returns ``(src_w, src_h, w, h, jpeg_bytes)`` —
    the JPEG twin of ``png.png_resize``."""
    import numpy as np

    from rehiver_spark.functions.png import fit_dims

    w, h, _nc, arr = decode_jpeg(b)
    tw, th = fit_dims(w, h, max_side)
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    small = arr[np.ix_(ys, xs)]
    return w, h, tw, th, encode_baseline(small)
