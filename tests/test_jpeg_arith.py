"""Arithmetic-coded JPEG (r13 stretch): the T.81 Annex D QM-coder and
the SOF9 sequential scan codecs in functions/jpeg_arith.py.

Validation strategy (the progressive-codec playbook): the encoder
shares encode_baseline's quantized coefficients, so decode_jpeg on the
arithmetic stream must be BIT-IDENTICAL to decode_baseline on the
Huffman stream — plus coder-level inverse/efficiency properties and
structural checks on the transcribed state table. No arithmetic-capable
reference codec exists in this container; compressed-size dominance
over Huffman on every fixture is asserted as the conformance signal.
"""

import random

import numpy as np
import pytest

from rehiver_spark.functions.jpeg import (
    decode_baseline,
    decode_jpeg,
    encode_baseline,
)
from rehiver_spark.functions.jpeg_arith import (
    _QE_TAB,
    ArithDecoder,
    ArithEncoder,
    encode_arithmetic,
)


def _gradient(w, h):
    x = np.linspace(0, 255, w, dtype=np.float64)[None, :]
    y = np.linspace(0, 255, h, dtype=np.float64)[:, None]
    return np.stack(
        [np.broadcast_to(x, (h, w)), np.broadcast_to(y, (h, w)), (x + y) / 2],
        -1,
    ).astype(np.uint8)


def test_qe_table_structural():
    """Table D.3 transcription sanity: 113 adaptive states + the fixed
    equiprobable one; all transitions closed; LPS transitions never
    decrease Qe and MPS transitions never increase it (the estimation
    direction the NLPS/NMPS columns encode — the r13 transposition bug
    cost 12.8 bits/bit until exactly this property was checked); the
    fast-attack chain 0..13 is Qe-monotone."""
    assert len(_QE_TAB) == 114
    for i, (qe, nlps, nmps, switch) in enumerate(_QE_TAB):
        assert 0 < qe <= 0x5B12 and 0 <= nlps < 114 and 0 <= nmps < 114, i
        assert switch in (0, 1)
        if i < 113:  # adaptation direction (state 113 self-loops)
            assert _QE_TAB[nmps][0] <= qe, f"MPS transition raises Qe at {i}"
            # an LPS moves toward bigger Qe — EXCEPT at switch states,
            # where the MPS sense flips and the walk restarts down the
            # fast-attack side (Qe ~0.5 there, so the flip is the point)
            if not switch:
                assert _QE_TAB[nlps][0] >= qe, f"LPS lowers Qe at {i}"
    fa = [_QE_TAB[i][0] for i in range(14)]
    assert fa == sorted(fa, reverse=True)
    qe, nlps, nmps, switch = _QE_TAB[113]
    assert (nlps, nmps, switch) == (113, 113, 0)  # fixed bin never adapts


def test_coder_exact_inverse_property():
    """Encoder/decoder are exact inverses over random multi-context
    decision streams at several skews (the core QM-coder pin)."""
    rng = random.Random(42)
    for trial in range(40):
        n_ctx = rng.randint(1, 8)
        n = rng.randint(1, 3000)
        p = rng.choice([0.02, 0.2, 0.5, 0.8, 0.98])
        bits = [
            (rng.randrange(n_ctx), rng.random() < p) for _ in range(n)
        ]
        enc = ArithEncoder()
        st = bytearray(n_ctx)
        for ctx, b in bits:
            enc.encode(st, ctx, int(b))
        data = enc.flush()
        dec = ArithDecoder(data)
        st2 = bytearray(n_ctx)
        got = [bool(dec.decode(st2, ctx)) for ctx, _ in bits]
        assert got == [b for _, b in bits], f"trial {trial}"
        assert st == st2  # the two state walks must agree bin-for-bin


def test_coder_efficiency_near_entropy():
    """The adaptive coder must approach the source entropy — random
    bits cost ~1.04 bits each, p=0.05 bits well under half a bit. This
    is the test that catches a transposed/miscopied state table (a
    self-consistent-but-wrong table still roundtrips)."""
    rng = random.Random(1)
    enc = ArithEncoder()
    st = bytearray(1)
    for _ in range(10000):
        enc.encode(st, 0, rng.getrandbits(1))
    assert len(enc.flush()) < 1350  # ~1.08 bits/bit ceiling

    enc = ArithEncoder()
    st = bytearray(1)
    for _ in range(10000):
        enc.encode(st, 0, 1 if rng.random() < 0.05 else 0)
    assert len(enc.flush()) < 600  # ideal ~357 B; QM gets ~382


def test_arithmetic_pixels_bit_identical_to_baseline():
    """encode_arithmetic shares encode_baseline's quantized
    coefficients, so decode_jpeg on the SOF9 stream must reproduce
    decode_baseline's pixels EXACTLY — and the arithmetic stream must
    be smaller than the Huffman one on every fixture (the only
    conformance signal available without a second arithmetic codec)."""
    rng = np.random.default_rng(42)
    fixtures = [
        _gradient(40, 24),
        rng.integers(0, 256, size=(13, 7), dtype=np.uint8),  # gray, odd
        np.full((32, 48, 3), 77, dtype=np.uint8),
        rng.integers(0, 256, size=(17, 33, 3), dtype=np.uint8),
    ]
    for img in fixtures:
        for q in (100, 92, 60):
            aw, ah, anc, apx = decode_jpeg(encode_arithmetic(img, quality=q))
            bw, bh, bnc, bpx = decode_baseline(encode_baseline(img, quality=q))
            assert (aw, ah, anc) == (bw, bh, bnc), (img.shape, q)
            assert np.array_equal(apx, bpx), (img.shape, q)
            assert len(encode_arithmetic(img, quality=q)) < len(
                encode_baseline(img, quality=q)
            ), (img.shape, q)


def test_arithmetic_restart_intervals():
    """DRI/RSTn: coder, statistics and DC predictions re-initialize per
    interval on both sides — pixels stay bit-identical to baseline for
    several interval lengths (including the degenerate every-MCU one)."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(33, 50, 3), dtype=np.uint8)
    base = decode_baseline(encode_baseline(img, quality=85))[3]
    for ri in (1, 3, 7):
        stream = encode_arithmetic(img, quality=85, restart_interval=ri)
        assert np.array_equal(decode_jpeg(stream)[3], base), ri


def test_decode_baseline_still_rejects_arithmetic():
    """decode_baseline keeps its documented contract — only decode_jpeg
    opts into SOF9; SOF10 (arithmetic progressive) stays an informative
    error everywhere."""
    img = _gradient(16, 16)
    stream = encode_arithmetic(img, quality=92)
    with pytest.raises(ValueError, match="arithmetic"):
        decode_baseline(stream)
    # flip SOF9 -> SOF10: informative rejection, not a crash
    sof10 = stream.replace(b"\xff\xc9", b"\xff\xca", 1)
    with pytest.raises(ValueError, match="arithmetic progressive"):
        decode_jpeg(sof10)
