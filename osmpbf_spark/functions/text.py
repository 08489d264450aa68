"""Text-analysis functions for large-scale training-data pipelines.

All hot-path math is Catalyst built-ins (split/transform/aggregate/md5) —
JVM-side, whole-stage codegen, no Python UDFs. Every function has a
dual-rendered SQL form (Spark / DuckDB) where the driver's oracle needs to
replicate it bit-for-bit; the shared primitive is a polynomial string hash
over unicode code points mod 1e9+7, kept below int64 overflow in both
engines.

Scale notes (100 TB): all functions are row-local (narrow) — they pipeline
with the scan, no shuffle; token explosion is bounded by ``max_tokens``
caps where quadratic blowup is possible.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_MOD = 1_000_000_007
HASH_BASE = 31

# Tiny per-language stopword marker sets for the n-gram/stopword language
# heuristic. Deliberately small + frozen: deterministic, oracle-friendly.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une"],
    "es": ["el", "la", "que", "de", "los", "es", "un", "una"],
    "it": ["il", "la", "che", "di", "non", "per", "una", "sono"],
}


def poly_hash_sql(expr: str, dialect: str = "spark") -> str:
    """Polynomial rolling hash of a string column mod 1e9+7 — the document
    fingerprint primitive, rendered for either engine.

    acc = (acc*31 + code_point) % p, left to right. acc < 1e9+7 and
    code points < 1.2e6, so acc*31+cp < 3.2e10 — no int64 overflow in
    either engine.
    """
    if dialect == "spark":
        # split('','') yields a trailing empty string element in Spark —
        # filter non-empty; ascii() returns the first code point.
        return (f"aggregate(filter(split({expr}, ''), c -> c != ''), 0L, "
                f"(acc, c) -> (acc * {HASH_BASE} + ascii(c)) % {HASH_MOD})")
    return (f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"[unicode(c) FOR c IN string_split_regex({expr}, '') "
            f"IF c != '']), "
            f"(acc, c) -> (acc * {HASH_BASE} + c) % {HASH_MOD})")


def fingerprint(text_col: str) -> Column:
    """Document fingerprint (rolling hash) — SURVEY-mandated text op."""
    return F.expr(poly_hash_sql(text_col, "spark"))


def poly_hash_vec(text_col: str) -> Column:
    """Vectorized (Arrow) form of :func:`poly_hash_sql` — bit-identical
    values, ~15× the throughput of the interpreted per-char Catalyst
    fold (r6, guide §4.2: the fingerprint fold was the measured 2.3 s
    hot spot of doc_profile at sf0.1).

    Exactness: Horner's acc=(acc·31+cp) mod p equals
    (Σ cp_i·31^(L−1−i)) mod p, computed here as one segmented
    ``np.add.reduceat`` over the batch's concatenated code points —
    every term < p·1.2e6 < 2^60 and segment sums stay < 2^63, so the
    int64 math never rounds. Code points come from ``utf-32-le`` bytes
    (Python/Arrow strings iterate code points incl. astral, same as
    Spark's ``split(s, '')``/``ascii`` — pinned by test). NULL → NULL,
    '' → 0, matching the SQL rendering."""
    @F.pandas_udf("long")
    def _ph(s: pd.Series) -> pd.Series:
        import numpy as np
        out = [None] * len(s)
        idxs = [i for i, v in enumerate(s) if v is not None]
        if not idxs:
            return pd.Series(out, dtype="object")
        texts = [s.iloc[i] for i in idxs]
        lens = np.fromiter((len(t) for t in texts), dtype=np.int64,
                           count=len(texts))
        total = int(lens.sum())
        if total == 0:
            for i in idxs:
                out[i] = 0
            return pd.Series(out, dtype="object")
        codes = np.frombuffer("".join(texts).encode("utf-32-le"),
                              dtype="<u4").astype(np.int64)
        ends = np.cumsum(lens)
        starts = ends - lens
        pows = np.ones(int(lens.max()), dtype=np.int64)
        for k in range(1, len(pows)):
            pows[k] = (pows[k - 1] * HASH_BASE) % HASH_MOD
        exps = np.repeat(ends - 1, lens) - np.arange(total)
        terms = (codes * pows[exps]) % HASH_MOD
        # reduceat needs strictly valid indices: empty strings get 0
        nz = lens > 0
        sums = np.zeros(len(texts), dtype=np.int64)
        if nz.any():
            sums[nz] = np.add.reduceat(terms, starts[nz]) % HASH_MOD
        for j, i in enumerate(idxs):
            out[i] = int(sums[j])
        return pd.Series(out, dtype="object")
    return _ph(F.col(text_col))


def doc_signals_vec(text_col: str) -> Column:
    """Vectorized (Arrow) form of the FULL doc_profile signal set — one
    pandas_udf returning the 9 signal columns as a struct, bit-identical
    to the dual-rendered SQL renderings below (each pinned by
    tests/test_r06_optimizations.py against the Catalyst forms and by
    the driver's doc_profile oracle hash).

    Why (r6, guide §4.2): the seven token/line signals are interpreted
    higher-order-function folds — measured ~45 µs/doc of interpreted
    overhead (quality alone 0.23 s for 5,000 sf0.1 docs) — while the
    text column ALREADY crosses the JVM→Python Arrow boundary once for
    the fingerprint, so fusing every signal into that one crossing
    removes the interpreted cost without adding transfer.

    Exactness notes (each mirrors the SQL rendering's 3VL and float
    semantics):

    - tokens = Java/Python ``split(' ')`` with empties dropped — tokens
      never contain a space, so distinct-bigram counting on (a, b)
      tuples equals the SQL's distinct on ``concat(a, ' ', b)``.
    - float formulas evaluate left-associatively in IEEE double exactly
      as Catalyst's codegen does; quantization is the same
      ``floor(x·10⁴ + 0.5)/10⁴``; ``round(q, 4)`` replicates Spark's
      ``BigDecimal.valueOf(double)`` (shortest decimal repr) via
      ``Decimal(repr(q))`` with HALF_UP.
    - NULL text → (NULL, NULL, NULL, 'und', 0.0, 0.0, 0.0, 0.0, 0.0):
      the fingerprint/n_tokens/quality renderings propagate NULL, the
      langid CASE falls through its unknown WHENs to 'und', and the
      ratio signals use the inverted `n >= 1` guard that maps NULL
      to 0.0.
    - ``ltrim``/``rtrim`` trim the space character only → ``strip(' ')``;
      lines come from ``split(chr(10))`` with empties dropped;
      ``right(s, k)`` for short s is s itself → Python ``s[-k:]``.
    - symbol counts: ``replace``-based occurrence counts are
      non-overlapping left-to-right in both engines → ``str.count``;
      the '...' count rides an exact ``(3·c)/3`` double division.
    - lengths count code points (Spark ``length``/UTF8String.numChars ==
      Python ``len``, astral planes included)."""
    _en = frozenset(LANG_MARKERS["en"])
    _langs = sorted(LANG_MARKERS)
    _marker_langs: dict[str, list[str]] = {}
    for _lang in _langs:
        for _w in LANG_MARKERS[_lang]:
            _marker_langs.setdefault(_w, []).append(_lang)
    # deleting the [a-zA-Z ] class and diffing lengths counts the kept
    # chars of regexp_replace(text, '[^a-zA-Z ]', '') at C speed
    _alpha_del = {ord(c): None for c in
                  "abcdefghijklmnopqrstuvwxyz"
                  "ABCDEFGHIJKLMNOPQRSTUVWXYZ "}

    @F.pandas_udf("fingerprint long, n_tokens long, quality double, "
                  "lang_guess string, rep_bigram double, "
                  "mean_word_len double, symbol_ratio double, "
                  "bullet_frac double, ellipsis_frac double")
    def _sig(s: pd.Series) -> pd.DataFrame:
        import math
        from decimal import ROUND_HALF_UP, Decimal

        import numpy as np

        n_rows = len(s)
        fp = [None] * n_rows
        ntok: list = [None] * n_rows
        qual: list = [None] * n_rows
        lang = ["und"] * n_rows
        rep = [0.0] * n_rows
        mwl = [0.0] * n_rows
        sym = [0.0] * n_rows
        bul = [0.0] * n_rows
        ell = [0.0] * n_rows
        q4 = Decimal("0.0001")
        texts, idxs = [], []
        for i, v in enumerate(s):
            if v is None:
                continue
            texts.append(v)
            idxs.append(i)
            toks = [t for t in v.split(" ") if t]
            nt = len(toks)
            ntok[i] = nt
            # quality: stopword band + alpha ratio + length band
            nstop = 0
            counts = dict.fromkeys(_langs, 0)
            for t in toks:
                if t in _en:
                    nstop += 1
                ls = _marker_langs.get(t)
                if ls is not None:
                    for lg in ls:
                        counts[lg] += 1
            kept = len(v) - len(v.translate(_alpha_del))
            alpha = kept / float(len(v) + 1)
            q = (0.4 * min(nstop / (nt + 1.0) * 8.0, 1.0)
                 + 0.3 * alpha + 0.3 * min(nt / 100.0, 1.0))
            qual[i] = float(Decimal(repr(q)).quantize(q4, ROUND_HALF_UP))
            for lg in _langs:
                c = counts[lg]
                if c > 0 and all(c >= counts[o] for o in _langs
                                 if o != lg):
                    lang[i] = lg
                    break
            if nt >= 2:
                nbg = nt - 1
                d = len(set(zip(toks, toks[1:])))
                rep[i] = math.floor((1.0 - d / float(nbg)) * 10000
                                    + 0.5) / 10000
            if nt >= 1:
                total = 0
                for t in toks:
                    total += len(t)
                mwl[i] = math.floor(total / float(nt) * 10000
                                    + 0.5) / 10000
                dots = (len(v) - len(v.replace("...", ""))) / 3
                syms = v.count("#") + dots + v.count("…")
                sym[i] = math.floor(syms / float(nt) * 10000
                                    + 0.5) / 10000
            lines = [ln for ln in v.split("\n") if ln]
            nl = len(lines)
            if nl >= 1:
                hb = he = 0
                for ln in lines:
                    if ln.lstrip(" ")[:1] in ("-", "*", "•"):
                        hb += 1
                    r = ln.rstrip(" ")
                    if r[-3:] == "..." or r[-1:] == "…":
                        he += 1
                bul[i] = math.floor(hb / float(nl) * 10000 + 0.5) / 10000
                ell[i] = math.floor(he / float(nl) * 10000 + 0.5) / 10000
        # fingerprint: the poly_hash_vec batch kernel, inlined so the
        # code-point extraction is shared across the whole batch
        if texts:
            lens = np.fromiter((len(t) for t in texts), dtype=np.int64,
                               count=len(texts))
            total = int(lens.sum())
            if total == 0:
                for i in idxs:
                    fp[i] = 0
            else:
                codes = np.frombuffer(
                    "".join(texts).encode("utf-32-le"),
                    dtype="<u4").astype(np.int64)
                ends = np.cumsum(lens)
                starts = ends - lens
                pows = np.ones(int(lens.max()), dtype=np.int64)
                for k in range(1, len(pows)):
                    pows[k] = (pows[k - 1] * HASH_BASE) % HASH_MOD
                exps = np.repeat(ends - 1, lens) - np.arange(total)
                terms = (codes * pows[exps]) % HASH_MOD
                nz = lens > 0
                sums = np.zeros(len(texts), dtype=np.int64)
                if nz.any():
                    sums[nz] = np.add.reduceat(terms,
                                               starts[nz]) % HASH_MOD
                for j, i in enumerate(idxs):
                    fp[i] = int(sums[j])
        return pd.DataFrame({
            "fingerprint": pd.Series(fp, dtype="object"),
            "n_tokens": pd.Series(ntok, dtype="object"),
            "quality": pd.Series(qual, dtype="object"),
            "lang_guess": lang, "rep_bigram": rep,
            "mean_word_len": mwl, "symbol_ratio": sym,
            "bullet_frac": bul, "ellipsis_frac": ell})
    return _sig(F.col(text_col))


HASH_MOD2 = 1_000_000_009
HASH_BASE2 = 131


def _poly2_sql(expr: str, dialect: str) -> str:
    """:func:`poly_hash_sql` with independent base/modulus (131 mod
    1e9+9) — the second leg of :func:`wide_hash_sql`."""
    if dialect == "spark":
        return (f"aggregate(filter(split({expr}, ''), c -> c != ''), 0L, "
                f"(acc, c) -> (acc * {HASH_BASE2} + ascii(c)) "
                f"% {HASH_MOD2})")
    return (f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"[unicode(c) FOR c IN string_split_regex({expr}, '') "
            f"IF c != '']), "
            f"(acc, c) -> (acc * {HASH_BASE2} + c) % {HASH_MOD2})")


def wide_hash_sql(expr: str, dialect: str = "spark") -> str:
    """~62-bit string hash: the two independent polynomial hashes
    combined as ``h31 · (1e9+9) + h131`` (max ≈ 1.0e18, inside int64).

    Exists because mod-1e9 alone is NOT collision-safe at corpus
    scale: matching a 100 TB crawl's ~10¹¹ distinct n-grams against an
    eval set's ~10⁵ hashes in a 10⁹ space yields ~10⁷ birthday false
    positives (measured: 1,567 phantom hits on a 1M-doc synthetic,
    within 0.1% of the predicted 28M·56k/1e9 — tools/
    decon_scale_bench.py). Pairing two independent hashes pushes the
    space to ~10¹⁸, and both legs render identically in Spark and
    DuckDB, unlike a 64-bit builtin (xxhash64 has no DuckDB twin)."""
    return (f"(({poly_hash_sql(expr, dialect)}) * {HASH_MOD2} "
            f"+ ({_poly2_sql(expr, dialect)}))")


def tokens_sql(expr: str, dialect: str = "spark") -> str:
    """Whitespace tokenization, rendered for either engine (empty tokens
    dropped so leading/trailing spaces don't differ between engines)."""
    if dialect == "spark":
        return f"filter(split({expr}, ' '), t -> t != '')"
    return f"list_filter(string_split({expr}, ' '), t -> t != '')"


def token_count(text_col: str) -> Column:
    return F.expr(f"size({tokens_sql(text_col)})")


def bpe_ish_token_count(text_col: str) -> Column:
    """BPE-ish token estimate: split on word boundaries/punct/digits
    (regex), the standard cheap proxy for tokenizer counts."""
    return F.expr(
        f"size(filter(split({text_col}, "
        r"'(?=[^a-zA-Z0-9])|(?<=[^a-zA-Z0-9])'), t -> t != ''))")


def quality_score_sql(expr: str, dialect: str = "spark") -> str:
    """Heuristic quality score in [0,1]: mean-word-length band + stopword
    presence + alpha ratio, rounded to 4 decimals (cross-engine float
    safety). One arithmetic definition rendered to both engines."""
    toks = tokens_sql(expr, dialect)
    alpha = (f"(length(regexp_replace({expr}, '[^a-zA-Z ]', '')) "
             f"/ CAST(length({expr}) + 1 AS DOUBLE))")
    if dialect == "spark":
        # let-bind the token array once (r6): the score references it
        # three times and interpreted HOFs re-evaluate per reference
        nstop = ("size(filter(w.t, t -> t IN "
                 "('the','and','of','to','is','in','that','it')))")
        ntok = "size(w.t)"
        inner = (f"round(0.4 * LEAST({nstop} / (CAST({ntok} AS DOUBLE) "
                 f"+ 1.0) * 8.0, 1.0) + 0.3 * {alpha} + 0.3 * "
                 f"LEAST({ntok} / 100.0, 1.0), 4)")
        return (f"element_at(transform(array(struct(({toks}) AS t)), "
                f"w -> {inner}), 1)")
    nstop = (f"len(list_filter({toks}, t -> t IN "
             "('the','and','of','to','is','in','that','it')))")
    ntok = f"len({toks})"
    return (f"round(0.4 * LEAST({nstop} / (CAST({ntok} AS DOUBLE) + 1.0) "
            f"* 8.0, 1.0) + 0.3 * {alpha} + 0.3 * "
            f"LEAST({ntok} / 100.0, 1.0), 4)")


def quality_score(text_col: str) -> Column:
    return F.expr(quality_score_sql(text_col, "spark"))


def langid_sql(expr: str, dialect: str = "spark") -> str:
    """Stopword-marker language ID: the language whose marker set overlaps
    the token set most; ties → lexicographically smallest language; no
    overlap anywhere → 'und'. Rendered for both engines."""
    toks = tokens_sql(expr, dialect)
    if dialect == "spark":
        # two-level let-bind (r6): the token ARRAY evaluates once (the
        # six marker filters would otherwise each re-split the text),
        # and the six marker COUNTS evaluate once (the naive CASE
        # references every count up to 6×) — interpreted HOFs re-run
        # per reference; same values, ~2× on this signal
        fields = ", ".join(
            f"size(filter(w0.t, t -> t IN "
            f"({','.join(repr(m) for m in markers)}))) AS s_{lang}"
            for lang, markers in sorted(LANG_MARKERS.items()))
        case = "CASE "
        for lang in sorted(LANG_MARKERS):
            others = [f"w.s_{lang} >= w.s_{lang2}"
                      for lang2 in sorted(LANG_MARKERS) if lang2 != lang]
            case += (f"WHEN w.s_{lang} > 0 AND " + " AND ".join(others)
                     + f" THEN '{lang}' ")
        case += "ELSE 'und' END"
        return (f"element_at(transform(array(struct(({toks}) AS t)), "
                f"w0 -> element_at(transform(array(struct({fields})), "
                f"w -> {case}), 1)), 1)")
    scores = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        lst = "(" + ",".join(f"'{m}'" for m in markers) + ")"
        s = f"len(list_filter({toks}, t -> t IN {lst}))"
        scores.append((lang, s))
    # argmax with deterministic tie-break by language code
    case = "CASE "
    for lang, s in scores:
        others = [f"{s} >= {s2}" for lang2, s2 in scores if lang2 != lang]
        case += (f"WHEN {s} > 0 AND " + " AND ".join(others)
                 + f" THEN '{lang}' ")
    case += "ELSE 'und' END"
    return case


def langid(text_col: str) -> Column:
    return F.expr(langid_sql(text_col, "spark"))


def shingles_sql(expr: str, n: int, dialect: str = "spark") -> str:
    """Word n-gram shingles as an array of strings (the MinHash input)."""
    toks = tokens_sql(expr, dialect)
    if dialect == "spark":
        # guard: sequence(1, 0) in Spark is the DESCENDING [1, 0] — short
        # docs must yield an empty shingle array, not slice(…, 0, …)
        return (f"IF(size({toks}) < {n}, CAST(array() AS ARRAY<STRING>), "
                f"transform(sequence(1, size({toks}) - {n - 1}), "
                f"i -> concat_ws(' ', slice({toks}, i, {n}))))")
    return (f"[array_to_string(list_slice({toks}, i, i + {n - 1}), ' ') "
            f"FOR i IN range(1, GREATEST(len({toks}) - {n - 1}, 0) + 1)]")


def repetition_ratio_sql(expr: str, dialect: str = "spark") -> str:
    """Gopher-style within-document repetition signal: the fraction of
    token BIGRAMS that are repeats, ``1 − distinct(bigrams)/bigrams``
    (0.0 for docs under 2 tokens). High values flag boilerplate /
    degenerate generations that the quality score's stopword/length
    bands miss. One arithmetic definition rendered to both engines;
    quantized via ``FLOOR(v·10⁴ + 0.5)/10⁴`` rather than ROUND — ratios
    are small rationals, and a dyadic value like 1/32 = 0.03125 is an
    EXACT 4-decimal tie where half-up (Spark) and half-even diverge."""
    toks = tokens_sql(expr, dialect)
    if dialect == "spark":
        # zip_with over two slices, NOT shingles_sql's per-index
        # transform+slice: that form re-evaluates an O(n) slice per
        # element (O(n²) interpreted — measured 8× on doc_profile at
        # sf0.1); the two slices here evaluate once each
        n1 = f"GREATEST(size({toks}) - 1, 0)"
        bg = (f"zip_with(slice({toks}, 1, {n1}), "
              f"slice({toks}, 2, {n1}), (a, b) -> concat(a, ' ', b))")
        # let-bind the bigram array once (r6): n appears twice and d
        # once in the CASE below, and interpreted HOFs re-evaluate the
        # whole token→slice→zip pipeline per reference — same values,
        # one evaluation
        inner = (f"CASE WHEN size(w.bg) >= 1 "
                 f"THEN FLOOR((1.0 - size(array_distinct(w.bg)) "
                 f"/ CAST(size(w.bg) AS DOUBLE)) * 10000 "
                 f"+ 0.5) / 10000 ELSE CAST(0.0 AS DOUBLE) END")
        return (f"element_at(transform(array(struct(({bg}) AS bg)), "
                f"w -> {inner}), 1)")
    else:
        n1 = f"GREATEST(len({toks}) - 1, 0)"
        bg = (f"[x[1] || ' ' || x[2] FOR x IN "
              f"list_zip(list_slice({toks}, 1, {n1}), "
              f"list_slice({toks}, 2, {n1} + 1))]")
        n, d = f"len({bg})", f"len(list_distinct({bg}))"
    # guard INVERTED on purpose (code-review r4): on NULL text Spark's
    # size() is NULL, so `n < 1` is unknown and the ELSE branch would
    # return NULL while DuckDB's comprehension yields [] → 0.0; with
    # `n >= 1 THEN ratio ELSE 0.0`, a NULL n falls to 0.0 in BOTH
    # engines, matching the documented under-2-tokens semantics
    return (f"CASE WHEN {n} >= 1 "
            f"THEN FLOOR((1.0 - {d} / CAST({n} AS DOUBLE)) * 10000 "
            f"+ 0.5) / 10000 ELSE CAST(0.0 AS DOUBLE) END")


def repetition_ratio(text_col: str) -> Column:
    return F.expr(repetition_ratio_sql(text_col, "spark"))


def mean_word_length_sql(expr: str, dialect: str = "spark") -> str:
    """Gopher-class signal: mean token length (0.0 for empty/NULL text —
    inverted guard, see :func:`repetition_ratio_sql`'s 3VL note). The
    classic gate drops documents outside the [3, 10] band. FLOOR
    half-up quantization to 4 decimals, same cross-engine tie rule as
    the other ratio columns."""
    toks = tokens_sql(expr, dialect)
    if dialect == "spark":
        # let-bind the token array once (r6): total + the two guard/
        # denominator references would re-split the text per reference
        inner = ("CASE WHEN size(w.t) >= 1 THEN FLOOR("
                 "aggregate(w.t, 0L, (acc, t) -> acc + length(t)) "
                 "/ CAST(size(w.t) AS DOUBLE) "
                 "* 10000 + 0.5) / 10000 ELSE CAST(0.0 AS DOUBLE) END")
        return (f"element_at(transform(array(struct(({toks}) AS t)), "
                f"w -> {inner}), 1)")
    total = (f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
             f"[length(t) FOR t IN {toks}]), (a, b) -> a + b)")
    n = f"len({toks})"
    return (f"CASE WHEN {n} >= 1 THEN FLOOR({total} / CAST({n} AS DOUBLE) "
            f"* 10000 + 0.5) / 10000 ELSE CAST(0.0 AS DOUBLE) END")


def mean_word_length(text_col: str) -> Column:
    return F.expr(mean_word_length_sql(text_col, "spark"))


def symbol_word_ratio_sql(expr: str, dialect: str = "spark") -> str:
    """Gopher-class signal: symbol-to-word ratio — occurrences of the
    hash symbol, the three-dot ellipsis, and the unicode ellipsis per
    token (the classic gate drops documents above 0.1). Counting is
    length-difference arithmetic (replace is identical in both
    engines); 0.0 for empty/NULL text via the inverted guard."""
    toks = tokens_sql(expr, dialect)
    n = (f"size({toks})" if dialect == "spark" else f"len({toks})")
    hashes = f"(length({expr}) - length(replace({expr}, '#', '')))"
    dots = (f"((length({expr}) - length(replace({expr}, '...', ''))) / 3)"
            if dialect == "spark" else
            f"((length({expr}) - length(replace({expr}, '...', ''))) // 3)")
    uni = f"(length({expr}) - length(replace({expr}, '…', '')))"
    return (f"CASE WHEN {n} >= 1 THEN FLOOR(({hashes} + {dots} + {uni}) "
            f"/ CAST({n} AS DOUBLE) * 10000 + 0.5) / 10000 "
            f"ELSE CAST(0.0 AS DOUBLE) END")


def symbol_word_ratio(text_col: str) -> Column:
    return F.expr(symbol_word_ratio_sql(text_col, "spark"))


def _lines_sql(expr: str, dialect: str) -> str:
    """Non-empty lines of a document. The newline is chr(10) in BOTH
    renderings — a literal '\\n' means newline to Spark's parser but a
    two-character backslash-n to DuckDB's default (non-E) strings."""
    if dialect == "spark":
        return f"filter(split({expr}, chr(10)), l -> l != '')"
    return f"list_filter(string_split({expr}, chr(10)), l -> l != '')"


def bullet_line_frac_sql(expr: str, dialect: str = "spark") -> str:
    """Gopher-class signal: fraction of non-empty lines that start with
    a bullet marker ('-', '*', '•') after left-trim (the classic gate
    drops documents above 0.9). 0.0 for empty/NULL text."""
    lines = _lines_sql(expr, dialect)
    cond = "substring(ltrim(l), 1, 1) IN ('-', '*', '•')"
    if dialect == "spark":
        hit, n = (f"size(filter({lines}, l -> {cond}))", f"size({lines})")
    else:
        hit, n = (f"len(list_filter({lines}, l -> {cond}))",
                  f"len({lines})")
    return (f"CASE WHEN {n} >= 1 THEN FLOOR({hit} / CAST({n} AS DOUBLE) "
            f"* 10000 + 0.5) / 10000 ELSE CAST(0.0 AS DOUBLE) END")


def bullet_line_frac(text_col: str) -> Column:
    return F.expr(bullet_line_frac_sql(text_col, "spark"))


def ellipsis_line_frac_sql(expr: str, dialect: str = "spark") -> str:
    """Gopher-class signal: fraction of non-empty lines that end with an
    ellipsis ('...' or '…') after right-trim (the classic gate drops
    documents above 0.3). 0.0 for empty/NULL text."""
    lines = _lines_sql(expr, dialect)
    cond = ("(right(rtrim(l), 3) = '...' OR right(rtrim(l), 1) = '…')")
    if dialect == "spark":
        hit, n = (f"size(filter({lines}, l -> {cond}))", f"size({lines})")
    else:
        hit, n = (f"len(list_filter({lines}, l -> {cond}))",
                  f"len({lines})")
    return (f"CASE WHEN {n} >= 1 THEN FLOOR({hit} / CAST({n} AS DOUBLE) "
            f"* 10000 + 0.5) / 10000 ELSE CAST(0.0 AS DOUBLE) END")


def ellipsis_line_frac(text_col: str) -> Column:
    return F.expr(ellipsis_line_frac_sql(text_col, "spark"))


def char_ngrams_sql(expr: str, n: int, dialect: str = "spark") -> str:
    """Character n-gram set (distinct) for Jaccard similarity."""
    if dialect == "spark":
        return (f"array_distinct(transform(sequence(1, GREATEST(length({expr})"
                f" - {n - 1}, 1)), i -> substring({expr}, i, {n})))")
    return (f"list_distinct([substring({expr}, i, {n}) FOR i IN "
            f"range(1, GREATEST(length({expr}) - {n - 1}, 1) + 1)])")


# PII scrubbing (the Dolma/C4-style pre-release redaction pass):
# conservative, high-precision patterns — an email-shaped token, a
# dotted-quad, an international-prefixed or xxx-xxx-xxxx phone. Order
# matters (emails contain dots; scrub them before the IP pattern could
# ever see a dotted domain). Each pattern avoids constructs where Java
# regex (Spark) and RE2 (DuckDB) diverge: no backreferences, no
# lookaround, explicit character classes.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email",
     r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4",
     r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone",
     r"\+\d[\d\- ]{6,14}\d|\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]


def _pat(pattern: str, dialect: str) -> str:
    """The pattern as a string literal for either engine: Spark SQL
    literals eat one level of backslash escaping; DuckDB's do not."""
    if dialect == "spark":
        return "'" + pattern.replace("\\", "\\\\") + "'"
    return "'" + pattern + "'"


def scrub_pii_sql(expr: str, dialect: str = "spark") -> str:
    """Text with every PII match replaced by its typed placeholder —
    nested regexp_replace in pattern order (DuckDB needs the explicit
    'g' flag for replace-all; Spark replaces all by default)."""
    out = expr
    for _, pattern, repl in PII_PATTERNS:
        if dialect == "spark":
            out = (f"regexp_replace({out}, {_pat(pattern, dialect)}, "
                   f"'{repl}')")
        else:
            out = (f"regexp_replace({out}, {_pat(pattern, dialect)}, "
                   f"'{repl}', 'g')")
    return out


def scrub_pii(text_col: str) -> Column:
    return F.expr(scrub_pii_sql(text_col, "spark"))


def pii_count_sql(expr: str, dialect: str = "spark") -> str:
    """Total PII matches in the ORIGINAL text (counted before any
    scrub, in the same pattern order — the audit metric a redaction
    pass logs). regexp_extract_all exists in both engines; 0 for NULL
    or match-free text."""
    parts = []
    for _, pattern, _ in PII_PATTERNS:
        if dialect == "spark":
            parts.append(
                f"size(regexp_extract_all({expr}, "
                f"{_pat(pattern, dialect)}, 0))")
        else:
            parts.append(
                f"len(regexp_extract_all({expr}, "
                f"{_pat(pattern, dialect)}))")
    total = " + ".join(f"GREATEST({p}, 0)" for p in parts)
    return f"CAST(COALESCE({total}, 0) AS BIGINT)"


def pii_count(text_col: str) -> Column:
    return F.expr(pii_count_sql(text_col, "spark"))
