"""Property-based dual-rail tests (hypothesis): every operator that
exists at BOTH driver level (Python re/urllib) and Column level (Java
regex / url_encode) must agree on arbitrary inputs — the two dialects
diverging silently was a round-1 audit finding.

Spark calls are batched: hypothesis generates a case LIST per example
and each example runs ONE collect, keeping runtime sane.
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SEG = st.text(alphabet=list(string.ascii_lowercase + string.digits) + [".", "-", "_"], min_size=1, max_size=6)
PATH = st.lists(SEG, min_size=1, max_size=5).map("/".join)

PATTERNS = st.sampled_from(
    [
        "**/*.txt",
        "*",
        "**",
        "a/**/b",
        "**/*.{txt,json}",
        "data/*/x?",
        "[abc]*/**",
        "[!abc]*/**",
        "!**/tmp/**",
        "**/x*",
        "a?c",
    ]
)


@settings(max_examples=15, deadline=None)
@given(st.lists(st.tuples(PATH, PATTERNS), min_size=1, max_size=40))
def test_glob_driver_column_agree(spark, cases):
    from rehiver_spark.functions.globs import PathMatcher, glob_match

    m = PathMatcher()
    df = spark.createDataFrame(
        [(p, pat) for p, pat in cases], "path string, pattern string"
    )
    # per distinct pattern, one Column predicate (pattern is a plan-time arg)
    for pat in {pat for _, pat in cases}:
        sub = df.filter(F.col("pattern") == pat)
        got = {
            r["path"]: r["m"]
            for r in sub.select("path", glob_match("path", pat).alias("m")).collect()
        }
        for p, want in ((p, m.is_match(p, pat)) for p, pp in cases if pp == pat):
            assert got[p] == want, (p, pat, want)


DATEDICT = st.fixed_dictionaries(
    {
        "year": st.integers(2000, 2100),
        "month": st.integers(1, 12),
        "day": st.integers(1, 31),
    }
)


@settings(max_examples=25, deadline=None)
@given(DATEDICT)
def test_partition_format_parse_roundtrip(data):
    from rehiver_spark.operators.partitions import date_schema

    sch = date_schema()
    assert sch.parse(sch.format(data)) == data


KEYSEG = st.text(
    alphabet=list(string.ascii_letters + string.digits) + [" ", "%", "+", "=", "#", "&", "é", "日"],
    min_size=1,
    max_size=8,
)
KEY = st.lists(KEYSEG, min_size=1, max_size=4).map("/".join)


@settings(max_examples=10, deadline=None)
@given(st.lists(KEY, min_size=1, max_size=30, unique=True))
def test_s3key_codec_roundtrip_both_rails(spark, keys):
    from rehiver_spark.sources.catalog import (
        decode_s3_key,
        decode_s3_key_col,
        encode_s3_key,
        encode_s3_key_col,
    )

    # driver rail
    for k in keys:
        assert decode_s3_key(encode_s3_key(k)) == k
    # column rail agrees with the driver encoder AND round-trips
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    rows = df.select(
        "key",
        encode_s3_key_col("key").alias("enc"),
        decode_s3_key_col(encode_s3_key_col("key")).alias("rt"),
    ).collect()
    for r in rows:
        assert r["rt"] == r["key"], r
        assert r["enc"] == encode_s3_key(r["key"]), r


@settings(max_examples=15, deadline=None)
@given(st.lists(PATH, min_size=1, max_size=30))
def test_segment_glob_driver_column_agree(spark, paths):
    from rehiver_spark.functions.globs import segment_glob_match
    from rehiver_spark.operators.partitions import PartitionSchema

    pattern = "year=*/month=*"
    sch = PartitionSchema([])
    df = spark.createDataFrame([(p,) for p in paths], "path string")
    got = {
        r["path"]: r["m"]
        for r in df.select("path", segment_glob_match("path", pattern).alias("m")).collect()
    }
    for p in paths:
        assert got[p] == sch.matches_glob(p, pattern), p


TEXT = st.text(
    alphabet=list(string.ascii_lowercase + string.digits) + [" ", "\t", "\n", "."],
    min_size=0,
    max_size=60,
)


def _py_tokens(t: str) -> list[str]:
    return [x for x in " ".join(t.strip().split()).lower().split(" ") if x]


def _py_ngrams(t: str, k: int) -> list[str]:
    tk = _py_tokens(t)
    if not tk:
        return []
    return [" ".join(tk[i : i + k]) for i in range(max(len(tk) - k + 1, 1))]


@settings(max_examples=15, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=40), st.integers(min_value=2, max_value=5))
def test_word_ngrams_matches_python_reference(spark, texts, k):
    from rehiver_spark.operators.textops import word_ngrams

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = {
        r.i: list(r.g)
        for r in df.select("i", word_ngrams("t", k).alias("g")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_ngrams(t, k), (t, k)


@settings(max_examples=15, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=40))
def test_shingles_are_distinct_ngrams_with_empty_fallback(spark, texts):
    from rehiver_spark.operators.dedup import shingles

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = {
        r.i: list(r.g) for r in df.select("i", shingles("t", 3).alias("g")).collect()
    }
    for i, t in enumerate(texts):
        ng = _py_ngrams(t, 3)
        expected = list(dict.fromkeys(ng)) if ng else [""]
        assert got[i] == expected, t


FAST_PATTERNS = st.sampled_from(
    ["data/**/*.json", "**/*.txt", "a/b-c/**/*.gz", "year=2024/**/*.parquet"]
)


@settings(max_examples=15, deadline=None)
@given(st.lists(st.tuples(PATH, FAST_PATTERNS), min_size=1, max_size=40))
def test_fast_glob_path_equals_regex_path(spark, cases):
    """The startswith/endswith fast path must agree with the compiled
    regex on arbitrary keys for every fast-eligible pattern."""
    from pyspark.sql import functions as F
    from rehiver_spark.functions.globs import glob_match, glob_to_regex, _fast_predicate

    df = spark.createDataFrame(
        [(i, p, pat) for i, (p, pat) in enumerate(cases)], "i long, path string, pat string"
    )
    pats = sorted({pat for _, pat in cases})
    cols = []
    for j, pat in enumerate(pats):
        fast = _fast_predicate(F.col("path"), pat, dot=True, nocase=False)
        assert fast is not None, pat
        cols.append((fast == F.col("path").rlike(glob_to_regex(pat, dot=True))).alias(f"eq{j}"))
    rows = df.select(*cols).collect()
    for r in rows:
        assert all(r), r


@given(
    a=st.integers(-20, 99),
    b=st.integers(-20, 99),
    step=st.integers(1, 7),
    pad=st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_brace_range_expansion_matches_python_range(a, b, step, pad):
    from rehiver_spark.functions.globs import expand_braces

    sa, sb = str(a), str(b)
    if pad and a >= 0 and b >= 0:
        w = max(len(sa), len(sb)) + 1
        sa, sb = sa.zfill(w), sb.zfill(w)
    got = expand_braces("{%s..%s..%d}" % (sa, sb, step))
    exp_vals = list(range(a, b + 1, step)) if a <= b else list(range(a, b - 1, -step))
    if pad and a >= 0 and b >= 0:
        exp = [str(v).zfill(max(len(sa), len(sb))) for v in exp_vals]
    else:
        exp = [str(v) for v in exp_vals]
    assert got == exp


@given(
    alts=st.lists(SEG, min_size=1, max_size=3),
    kind=st.sampled_from(["@", "?", "*", "+", "!"]),
    probe=SEG,
)
@settings(max_examples=60, deadline=None)
def test_extglob_regex_compiles_in_both_dialects_and_matches_alts(alts, kind, probe):
    import re as _re

    from rehiver_spark.functions.globs import PathMatcher, glob_to_regex

    pat = kind + "(" + "|".join(alts) + ")"
    r = glob_to_regex(pat, dot=True)
    _re.compile(r)  # Python dialect compiles
    m = PathMatcher(dot=True)
    for alt in alts:
        if kind in "@+*?":
            assert m.is_match(alt, pat), (pat, alt)
        else:  # '!' rejects every exact alternate, accepts a non-alt
            assert not m.is_match(alt, pat), (pat, alt)
    if kind == "!" and probe not in alts:
        assert m.is_match(probe, pat), (pat, probe)


TEXTS = st.lists(
    st.text(alphabet=list(string.ascii_lowercase) + [" "], min_size=0, max_size=30),
    min_size=1,
    max_size=20,
)

# adversarial alphabet for cross-boundary text kernels: ASCII ws (the
# Java \s class), NBSP (\S on Java!), repeated tokens, an astral char,
# a combining mark, and uppercase for the lower() path
HARD_TEXTS = st.lists(
    st.text(
        alphabet=list("ab A\t\n\x0b\f\r") + [" ", "\U0001f600", "́"],
        min_size=0,
        max_size=24,
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=8, deadline=None)
@given(HARD_TEXTS)
def test_repetition_arrow_equals_expr_property(spark, texts):
    """The round-8 Arrow repetition kernel must be bit-identical to the
    expression form on ADVERSARIAL text: mixed ASCII whitespace runs
    (Java \\s), NBSP (which Java counts as \\S), astral code points,
    combining marks, case folding, and heavy token repetition."""
    from rehiver_spark.operators.textops import repetition_stats

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    cols = [
        "doc_id", "n_tokens", "distinct_token_ratio",
        "top_token_frac", "top_bigram_frac",
    ]
    key = lambda r: tuple(r[c] for c in cols)  # noqa: E731
    a = sorted(map(key, repetition_stats(df, impl="arrow").collect()))
    e = sorted(map(key, repetition_stats(df, impl="expr").collect()))
    assert a == e


@settings(max_examples=10, deadline=None)
@given(TEXTS)
def test_incremental_dedup_equals_batch_dedup(spark, texts):
    """Splitting a corpus into (corpus, batch) and running incremental
    dedup must accept exactly the batch texts whose normalized hash is
    unseen — i.e. union(corpus-keepers, accepted) == global keepers in
    hash terms, for ANY split."""
    from rehiver_spark.operators.dedup import (
        dedup_exact,
        dedup_index,
        incremental_exact_dedup,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    corpus = df.filter("doc_id % 2 = 0")
    batch = df.filter("doc_id % 2 = 1")
    out = incremental_exact_dedup(batch, dedup_index(corpus))
    accepted_hashes = {
        r["content_sha"] for r in out.filter("status = 'new'").collect()
    }
    corpus_hashes = {r["content_sha"] for r in dedup_exact(corpus).collect()}
    global_hashes = {r["content_sha"] for r in dedup_exact(df).collect()}
    assert corpus_hashes | accepted_hashes == global_hashes
    assert not (corpus_hashes & accepted_hashes)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 1000), st.floats(-100, 100, allow_nan=False)),
        min_size=4,
        max_size=50,
    )
)
def test_zorder_value_locality_per_dimension(spark, points):
    """For rows differing ONLY in one dimension, z-order keys must be
    monotone in that dimension's bucket (bit interleave preserves
    per-dimension order), and equal rows get equal keys."""
    from rehiver_spark.sources.writer import zorder_value

    rows = [(i, float(a), float(b)) for i, (a, b) in enumerate(points)]
    df = spark.createDataFrame(rows, "id bigint, a double, b double")
    z = df.select("id", "a", "b", zorder_value(df, ["a", "b"], bits=4).alias("z"))
    got = sorted((r["a"], r["b"], r["z"]) for r in z.collect())
    # equal (a, b) -> equal z
    seen = {}
    for a, b, zv in got:
        assert seen.setdefault((a, b), zv) == zv
    # fixing b, z is non-decreasing in a (quantile buckets are monotone)
    from collections import defaultdict

    by_b = defaultdict(list)
    for a, b, zv in got:
        by_b[b].append((a, zv))
    for b, pairs in by_b.items():
        pairs.sort()
        zs = [zv for _, zv in pairs]
        assert all(x <= y for x, y in zip(zs, zs[1:])), (b, pairs)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=5),
            st.floats(min_value=1e-6, max_value=10.0, allow_nan=False),
        ),
        min_size=1,
        max_size=6,
    )
)
def test_split_thresholds_partition_hash_space(weights):
    """The split bands must exactly partition the 60-bit hash space for
    ANY weight vector: strictly increasing upper bounds, last bound
    pinned at 2^60 (rounding can never leave a key unassigned), and
    each band's width proportional to its normalized weight."""
    from rehiver_spark.operators.textops import split_thresholds

    bounds = split_thresholds(weights)
    assert len(bounds) == len(weights)
    assert bounds[-1][1] == 1 << 60
    ubs = [b for _, b in bounds]
    assert all(0 <= a <= b for a, b in zip(ubs, ubs[1:]))
    total = sum(w for _, w in weights)
    lo = 0
    for (_, ub), (_, w) in zip(bounds, weights):
        frac = (ub - lo) / float(1 << 60)
        assert abs(frac - w / total) < 1e-6 + 1.0 / (1 << 59)
        lo = ub


# -- X57b pruned substring dedup: guarantee + degeneracy properties ---------

_VOCAB = ["aa", "bb", "cc", "dd", "ee", "ff"]
_DOC = st.lists(
    st.sampled_from(_VOCAB), min_size=0, max_size=40
).map(" ".join)


@settings(max_examples=10, deadline=None)
@given(st.lists(_DOC, min_size=2, max_size=10))
def test_pruned_dedup_min_run_eq_L_equals_exact_property(spark, docs):
    """For ANY corpus (tiny vocab → dense duplication, repeated-symbol
    runs, empty docs): min_run == L must reproduce the exact form
    bit-for-bit, and with min_run > L every doc's cut-token count is
    bounded by the exact form's (pruning only ever cuts LESS)."""
    from rehiver_spark.operators.textops import (
        dedup_substrings,
        dedup_substrings_pruned,
    )

    L = 4
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    key = lambda r: (  # noqa: E731
        r["doc_id"],
        r["cleaned_text"],
        r["n_tokens_before"],
        r["n_tokens_after"],
        r["n_cut_spans"],
    )
    exact = sorted(map(key, dedup_substrings(df, window_tokens=L).collect()))
    zero = sorted(
        map(
            key,
            dedup_substrings_pruned(df, window_tokens=L, min_run=L).collect(),
        )
    )
    assert exact == zero
    pruned = {
        r["doc_id"]: (r["n_tokens_before"], r["n_tokens_after"])
        for r in dedup_substrings_pruned(
            df, window_tokens=L, min_run=L + 3
        ).collect()
    }
    for did, ct, nb, na, _s in exact:
        pb, pa = pruned[did]
        assert pb == nb  # totals agree
        assert (pb - pa) <= (nb - na)  # never cuts more than exact


# -- BPE merge_once: classical sequential greedy on RANDOM sequences --------

_SYM = st.sampled_from(["a", "b", "ab", "c"])


def _ref_greedy(syms, pair):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


@settings(max_examples=12, deadline=None)
@given(
    st.lists(st.lists(_SYM, min_size=0, max_size=12), min_size=1, max_size=8),
    st.tuples(_SYM, _SYM),
)
def test_merge_once_equals_classical_greedy_random(spark, seqs, pair):
    """The space-doubling literal replace must equal the classical
    left-to-right greedy merge on arbitrary symbol sequences and
    arbitrary pairs — including self-pairs over long runs and symbols
    ('ab') that are concatenations of other symbols (the adversarial
    boundary case for literal string matching)."""
    from pyspark.sql import functions as F

    from rehiver_spark.operators.bpe import merge_once

    rows = [(i, " " + " ".join(s) + " " if s else "  ") for i, s in enumerate(seqs)]
    df = spark.createDataFrame(rows, "i long, s string")
    got = {
        r["i"]: [t for t in r["m"].split(" ") if t]
        for r in df.select(
            "i", merge_once(F.col("s"), pair[0], pair[1]).alias("m")
        ).collect()
    }
    for i, s in enumerate(seqs):
        assert got[i] == _ref_greedy(s, pair), (s, pair)


@settings(max_examples=6, deadline=None)
@given(st.lists(_DOC, min_size=2, max_size=8))
def test_auto_dedup_output_equals_its_chosen_branch(spark, docs):
    """X57 auto-dial (r7): forcing each side of the density cutoff
    must reproduce the corresponding branch bit-for-bit on ANY corpus
    — cutoff below any possible density (−1) ⇒ exact form, cutoff
    above any possible density (1.1) ⇒ pruned form. The dispatcher
    adds no semantics of its own."""
    from rehiver_spark.operators.textops import (
        dedup_substrings,
        dedup_substrings_auto,
        dedup_substrings_pruned,
    )

    L = 4
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    key = lambda r: (  # noqa: E731
        r["doc_id"],
        r["cleaned_text"],
        r["n_tokens_before"],
        r["n_tokens_after"],
        r["n_cut_spans"],
    )
    forced_exact = sorted(
        map(
            key,
            dedup_substrings_auto(
                df, window_tokens=L, min_run=L + 3, density_cutoff=-1.0
            ).collect(),
        )
    )
    assert forced_exact == sorted(
        map(key, dedup_substrings(df, window_tokens=L).collect())
    )
    forced_pruned = sorted(
        map(
            key,
            dedup_substrings_auto(
                df, window_tokens=L, min_run=L + 3, density_cutoff=1.1
            ).collect(),
        )
    )
    assert forced_pruned == sorted(
        map(
            key,
            dedup_substrings_pruned(df, window_tokens=L, min_run=L + 3).collect(),
        )
    )


@settings(max_examples=20, deadline=None)
@given(
    st.integers(1, 24),
    st.integers(1, 24),
    st.booleans(),
    st.integers(0, 2**32 - 1),
)
def test_jpeg_codec_roundtrip_property(w, h, gray, seed):
    """encode_baseline(q=100) → decode_baseline recovers every pixel
    within ±4 (all-ones quant table: DCT roundoff is the only loss; the
    analytic worst case of ±0.5-per-coefficient rounding plus YCbCr
    mixing is ~3.5, so ±2 is only empirical — the fixed-seed unit test
    keeps the tight bound) for arbitrary dims — including
    non-multiple-of-8 and 1-pixel edges — in both grayscale and RGB."""
    import numpy as np

    from rehiver_spark.functions.jpeg import decode_baseline, encode_baseline

    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    gw, gh, nc, out = decode_baseline(encode_baseline(img, quality=100))
    assert (gw, gh) == (w, h) and nc == (1 if gray else 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


@settings(max_examples=20, deadline=None)
@given(
    st.integers(1, 24),
    st.integers(1, 24),
    st.booleans(),
    st.sampled_from([100, 92, 60]),
    st.integers(0, 2**32 - 1),
)
def test_jpeg_progressive_equals_baseline_property(w, h, gray, q, seed):
    """encode_progressive shares encode_baseline's quantized
    coefficients, so decode_jpeg(progressive) must be BIT-IDENTICAL to
    decode_baseline(baseline) for arbitrary dims, both color modes and
    every quality — pinning all four progressive scan paths (r12)."""
    import numpy as np

    from rehiver_spark.functions.jpeg import (
        decode_baseline,
        decode_jpeg,
        encode_baseline,
        encode_progressive,
    )

    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    p = decode_jpeg(encode_progressive(img, quality=q))
    b = decode_baseline(encode_baseline(img, quality=q))
    assert p[:3] == b[:3]
    assert np.array_equal(p[3], b[3])


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 1 << 40), st.integers(0, 7), st.sampled_from([60, 64]))
def test_adaptive_match_blocks_properties(n, h, sig_bits):
    """The simhash k dial is monotone in n, clamped to [1, 5], and —
    below the clamp — always wide enough: the k-subset key carries at
    least bit_length(n-1)+slack bits."""
    from rehiver_spark.operators.dedup import adaptive_match_blocks

    k = adaptive_match_blocks(n, h, sig_bits)
    assert 1 <= k <= 5
    assert adaptive_match_blocks(n * 2 + 1, h, sig_bits) >= k  # monotone
    if k < 5:
        need = max(n - 1, 1).bit_length() + 2
        assert k * sig_bits // (h + k) >= need


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)),
        min_size=0,
        max_size=40,
    ),
    st.booleans(),
)
def test_connected_components_impls_agree_property(spark, edges, as_str):
    """Driver and distributed CC are the same fixpoint on arbitrary
    small graphs — int and string ids both (string exercises the r11
    join-based convergence path)."""
    from rehiver_spark.operators.dedup import connected_components

    if as_str:
        rows = [(f"n{a:02d}", f"n{b:02d}") for a, b in edges]
        schema = "id_a string, id_b string"
    else:
        rows = edges
        schema = "id_a long, id_b long"
    df = spark.createDataFrame(rows, schema) if rows else spark.createDataFrame(
        [], schema
    )
    got = {}
    for impl in ("driver", "distributed"):
        got[impl] = sorted(
            (r.doc_id, r.cluster_id)
            for r in connected_components(df, impl=impl).collect()
        )
    assert got["driver"] == got["distributed"]


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.text(alphabet="abcde ", min_size=0, max_size=60), min_size=1, max_size=8),
    st.integers(1, 9),
)
def test_winnow_cascade_matches_python_reference(spark, texts, window):
    """The r11 doubling-cascade sliding min must equal the naive
    per-window min for EVERY window width, including w=1 and widths
    that are not powers of two (the cascade's step math is the risky
    part) — checked against a pure-Python winnow reference."""
    from rehiver_spark.functions.hashing import md5_hash60_py
    from rehiver_spark.operators.textops import winnow_fingerprints

    k = 3
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.fp)
        for r in winnow_fingerprints(
            df, k=k, window=window, hash_fn="md5"
        ).collect()
    }

    def norm(t):  # mirror normalize_text: lower + collapse whitespace
        return " ".join(t.lower().split())

    want = set()
    for i, t in enumerate(texts):
        nt = norm(t)
        grams = (
            [nt[j : j + k] for j in range(len(nt) - k + 1)]
            if len(nt) >= k
            else [nt]
        )
        hs = [md5_hash60_py(g) for g in grams]
        n_windows = max(len(hs) - window + 1, 1)
        for j in range(n_windows):
            want.add((i, min(hs[j : j + window])))
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.text(alphabet=list("ab "), min_size=0, max_size=40),
        min_size=2,
        max_size=24,
    ),
    st.sampled_from([0.5, 0.7, 0.8]),
    st.sampled_from([0.15, 0.25]),
)
def test_minhash_est_gate_subset_property(spark, texts, threshold, margin):
    """The r12 estimate pre-filter is a SUBSET dial on arbitrary
    corpora, thresholds and margins: gated pairs ⊆ ungated pairs, and
    every surviving pair is a true above-threshold pair (both already
    ⊆ exact by the verify stage — this pins the gate can only ever
    REMOVE candidates, never corrupt scores, on adversarial tiny/dup/
    empty-text inputs hypothesis loves)."""
    from rehiver_spark.operators.dedup import minhash_neardup_pairs

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )

    def pairs(m):
        return {
            (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
            for r in minhash_neardup_pairs(
                df, threshold=threshold, hash_fn="md5", est_gate_margin=m
            ).collect()
        }

    ungated = pairs(None)
    gated = pairs(margin)
    assert set(gated) <= set(ungated)
    for k, v in gated.items():
        assert v == ungated[k] and v >= threshold
