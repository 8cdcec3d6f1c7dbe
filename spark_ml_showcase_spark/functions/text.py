"""Text analysis for training-data pipelines (SURVEY.md §2.12 X4):
language ID, quality scoring, token counting, document fingerprinting.

All pure ``pyspark.sql.functions`` column expressions — they run inside
whole-stage codegen, shuffle nothing, and scale linearly with a parquet
scan. Each returns a Column so callers compose them into one Project.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from spark_ml_showcase_spark.functions.rounding import round_like_duckdb

# Python-side tokenizer matching the ENGINE's whitespace contract
# exactly: the class below IS Java regex \s (so F.split(r"\s+") agrees
# char-for-char), while Python's str.split() also splits on Unicode
# whitespace (U+00A0 and friends) — a silent oracle divergence on
# non-ASCII corpora. RE2's \s is [ \t\n\f\r] — NO \x0b — so DuckDB
# oracle SQL must spell this class out explicitly, never write dialect
# \s (r14 ADVICE; swept engine-wide). Every Arrow-batched text UDF must
# tokenize with THIS, never bare .split().
_ASCII_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def py_tokens(text: str | None) -> list[str]:
    """Lowercased ASCII-whitespace tokens, empties filtered — the
    Python twin of ``_tokens(F.lower(col))``."""
    return [t for t in _ASCII_WS.split((text or "").lower()) if t]

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately ASCII-only and deterministic.
_LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "dans", "que", "pour"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "es", "por"],
}


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _tokens(col: Column) -> Column:
    """Whitespace tokens with empties filtered — robust to leading/
    trailing whitespace of ANY kind (F.trim strips only spaces, so a
    leading tab would otherwise yield a phantom '' token)."""
    return F.filter(F.split(col, r"\s+"), lambda t: t != "")


def whitespace_token_count(col: str | Column) -> Column:
    """Token count by whitespace runs; 0 for empty/blank strings."""
    return F.size(_tokens(_c(col)))


def bpe_ish_token_count(col: str | Column) -> Column:
    """Regex sub-word token count approximating a BPE tokenizer's granularity:
    word pieces, digit runs, and single non-space symbols each count as one
    token (a GPT-2-style pre-tokenizer pattern, simplified to the
    Java/RE2-common regex subset)."""
    # idx=0 (whole match): Spark 4.x defaults idx to 1 and rejects it when
    # the pattern has no capture group.
    pieces = F.regexp_extract_all(
        _c(col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0
    )
    return F.size(pieces)


def char_count(col: str | Column) -> Column:
    return F.length(_c(col))


def punct_ratio(col: str | Column) -> Column:
    """Fraction of characters that are ASCII punctuation."""
    c = _c(col)
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[!-/:-@\[-`{-~]", ""))
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(
        punct.cast("double") / F.length(c)
    )


def stopword_ratio(col: str | Column, lang: str = "en") -> Column:
    """Fraction of whitespace tokens that are stopwords for ``lang``."""
    toks = _tokens(F.lower(_c(col)))
    stops = F.array(*[F.lit(s) for s in _LANG_STOPWORDS[lang]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        n_stop.cast("double") / F.size(toks)
    )


def mean_word_length(col: str | Column) -> Column:
    """Mean characters per whitespace token (total chars — whitespace
    included — over token count; 0.0 for empty/blank). ONE definition
    shared by the heuristic ``quality_score`` and the learned filter's
    feature vector (``ml.quality_filter``): the learned model's feature
    must stay in lockstep with the weak-label signal it trains on."""
    c = _c(col)
    n_tok = whitespace_token_count(c).cast("double")
    n_chars = F.length(c).cast("double")
    return F.when(n_tok == 0, F.lit(0.0)).otherwise(n_chars / n_tok)


def quality_score(col: str | Column) -> Column:
    """Composite heuristic quality score in [0, 1]: rewards moderate length,
    low punctuation density, mid-range mean word length — the standard
    cheap pre-filters of web-scale corpus cleaning (C4-style)."""
    c = _c(col)
    n_tok = whitespace_token_count(c).cast("double")
    mean_word_len = mean_word_length(c)
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    word_len_score = F.when(
        (mean_word_len >= 3) & (mean_word_len <= 12), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    punct_score = F.lit(1.0) - F.least(punct_ratio(c) * 4, F.lit(1.0))
    return round_like_duckdb(
        (len_score + word_len_score + punct_score) / 3.0, 6
    )


def lang_id(col: str | Column) -> Column:
    """Heuristic language ID: argmax of per-language stopword hit counts;
    'und' (undetermined) when no list scores > 0. Deterministic tie-break
    by language-code order of the scores struct comparison."""
    toks = _tokens(F.lower(_c(col)))
    best = F.lit("und")
    best_score = F.lit(0)
    # Unrolled argmax keeps everything in one codegen'd expression tree.
    for lang in sorted(_LANG_STOPWORDS):
        stops = F.array(*[F.lit(s) for s in _LANG_STOPWORDS[lang]])
        score = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
        is_better = score > best_score
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best


def syllable_count(col: str | Column) -> Column:
    """Heuristic syllable count: vowel-group runs (``[aeiouy]+``) in the
    lowercased text — the standard cheap proxy readability formulas are
    defined over. Java∩RE2 regex subset, so a SQL oracle replays it."""
    return F.size(F.regexp_extract_all(F.lower(_c(col)), F.lit(r"[aeiouy]+"), 0))


def sentence_count(col: str | Column) -> Column:
    """Sentence-terminator runs (``[.!?]+``), floored at 1 for any
    non-empty text (a fragment with no terminal punctuation is one
    sentence, not a division by zero)."""
    c = _c(col)
    n = F.size(F.regexp_extract_all(c, F.lit(r"[.!?]+"), 0))
    return F.when(F.length(c) == 0, F.lit(0)).otherwise(F.greatest(n, F.lit(1)))


def flesch_reading_ease(col: str | Column) -> Column:
    """Flesch reading-ease score: ``206.835 − 1.015·(words/sentences) −
    84.6·(syllables/words)``, NULL for token-less text. Rounded to 4 —
    the division/multiply chain is written in one fixed order so a SQL
    twin reproduces it bit-for-bit."""
    c = _c(col)
    words = whitespace_token_count(c).cast("double")
    sents = sentence_count(c).cast("double")
    syls = syllable_count(c).cast("double")
    return F.when(words == 0, F.lit(None).cast("double")).otherwise(
        round_like_duckdb(
            F.lit(206.835) - F.lit(1.015) * (words / sents)
            - F.lit(84.6) * (syls / words),
            4,
        )
    )


def unicode_canonical_udf():
    """Arrow-batched Unicode canonicalization for dedup keys (X112):
    NFC normalization → Unicode lowercase → ASCII-whitespace collapse →
    trim, in THAT order (the DuckDB oracle twin is
    ``regexp_replace(regexp_replace(lower(nfc_normalize(text)),
    '^[ \\t\\n\\x0b\\f\\r]+|[ \\t\\n\\x0b\\f\\r]+$', '', 'g'),
    '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')`` — same order and the SAME
    spelled-out whitespace class, so the keys agree character for
    character; dialect ``\\s`` is banned in oracle SQL because RE2's
    ``\\s`` omits U+000B while Java's includes it).

    The real-world miss class this closes: visually identical documents
    that differ only in composition form (``café`` composed U+00E9 vs
    decomposed ``e`` + U+0301) or case survive byte-exact dedup —
    ``fingerprint``'s lower+collapse never merges them. NFC is the
    canonical-equivalence fold (NOT NFKC: compatibility folding — ﬁ
    ligatures, fullwidth forms — CHANGES content and is a different,
    lossier policy).

    Cross-engine contract (pinned in tests/test_dedup.py against a live
    DuckDB on planted confusables):
    - NFC: Python ``unicodedata`` and DuckDB's utf8proc implement the
      same stable normalization for assigned codepoints.
    - lowercase: pandas ``.str.lower()`` (Unicode default full case
      mapping) vs DuckDB ``lower()`` (utf8proc) agree on simple
      mappings; locale-dependent mappings (Turkish İ) are out of
      contract. ``lower`` (not Python ``casefold``) is the choice
      BECAUSE DuckDB has no casefold — ß/ẞ therefore stay distinct.
    - whitespace: ASCII-only collapse (``_ASCII_WS`` =
      ``[ \\t\\n\\x0b\\f\\r]``, spelled out on BOTH sides — this is
      Java's ``\\s`` exactly, but NOT RE2's, which omits U+000B, so
      oracle SQL writes the class explicitly instead of dialect
      ``\\s``); U+00A0 and friends are CONTENT, not separators, on
      both sides.

    NULL text canonicalizes to NULL (r14 ADVICE): SQL ``PARTITION BY``
    groups all NULLs as ONE group distinct from the empty string, so a
    ``fillna("")`` here would merge NULL docs with empty/whitespace-only
    docs on the Spark side only and flip the survivor counts. The nulls
    are masked around the vectorized chain and restored after.
    Downstream, ``xxhash64(NULL)`` yields the seed — a single non-NULL
    long — so all-NULL docs still form exactly one dedup group, at the
    same 2⁻⁶⁴ collision risk every xxhash64 group key already accepts.

    Python in the row path is deliberate: Spark has no built-in Unicode
    normalization expression (ICU collations affect comparison, not the
    projected key), so this is the (b)-tier Arrow-batched escape hatch —
    one narrow linear projection, no shuffle, pandas-vectorized
    normalize/lower/replace."""

    def fn(texts: pd.Series) -> pd.Series:
        nulls = texts.isna()
        out = (
            texts.fillna("")
            .str.normalize("NFC")
            .str.lower()
            .str.replace(_ASCII_WS, " ", regex=True)
            .str.strip(" ")
        )
        return out.mask(nulls)

    return F.pandas_udf(fn, "string")


def fingerprint(col: str | Column, *, normalize: bool = True) -> Column:
    """64-bit document fingerprint (xxhash64 of normalized text) for exact
    dedup at scale: grouping on a fixed-width long beats grouping on the
    raw text (smaller shuffle keys, no giant string comparisons)."""
    c = _c(col)
    if normalize:
        # regexp trim, not F.trim — F.trim strips SPACES only, so a
        # leading tab/newline would survive and split dup groups
        c = F.regexp_replace(
            F.regexp_replace(F.lower(c), r"^\s+|\s+$", ""), r"\s+", " "
        )
    return F.xxhash64(c)


# PII patterns kept to the Java-regex ∩ RE2 common subset so the DuckDB
# oracle applies the literal same patterns.
_PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"https?://[^\s]+", "[URL]"),
    (r"\b\d[\d -]{6,}\d\b", "[NUM]"),  # phone/account-style digit runs
]


def scrub_pii(col: str | Column) -> Column:
    """Corpus-cleaning PII scrub: emails → [EMAIL], URLs → [URL], long
    digit/phone runs → [NUM]. Chained ``regexp_replace`` — pure codegen
    expressions, no UDF; order matters (emails before the digit-run rule
    so numeric local-parts don't half-scrub).

    Placeholder tokens (not deletion) preserve token positions for
    downstream chunking/windowing. Patterns are deliberately in the
    Java/RE2 common regex subset so the oracle runs the SAME patterns.
    """
    c = _c(col)
    for pat, repl in _PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def winnow_fingerprints(
    col: str | Column, *, k: int = 25, window: int = 8
) -> Column:
    """Winnowing rolling-hash fingerprints (Schleimer/Wilkerson/Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    2003) as ``array<bigint>``: hash every character k-gram of the
    normalized text, then keep the MINIMUM hash of each window of
    ``window`` consecutive k-gram hashes (rightmost-min tie handling is
    irrelevant here because we return the distinct selected values).

    Guarantee inherited from the paper: any substring match of length
    ≥ window + k - 1 between two documents yields at least one SHARED
    fingerprint, so joining on exploded fingerprints finds all long
    overlaps — partial-overlap detection that whole-document
    ``fingerprint`` (exact dedup) cannot do.

    Pure JVM-side expressions (substring/xxhash64/transform/slice) —
    no UDF; per-row cost O(len·window). Empty/short docs (< window+k-1
    chars) yield an empty array.

    Pick ``k`` LONGER than substrings that recur by chance in unrelated
    documents (the paper's "noise threshold") — for natural text k≈25
    chars (~4 words) keeps accidental cross-document fingerprint
    collisions rare while any copied sentence still fingerprints.
    """
    c = F.regexp_replace(
        F.regexp_replace(F.lower(_c(col)), r"^\s+|\s+$", ""), r"\s+", " "
    )

    def bind(value: Column, fn) -> Column:
        # Evaluate `value` ONCE per row by passing it through a
        # single-element transform: HOF lambda variables are materialized,
        # while a plain subexpression would be re-inlined (and recomputed)
        # into EVERY element of the downstream transform — turning the
        # O(len·window) winnow into O(len²·k) per row.
        return F.element_at(F.transform(F.array(value), fn), 1)

    fps = bind(
        c,
        lambda s: bind(
            F.transform(
                F.sequence(F.lit(1), F.length(s) - F.lit(k - 1)),
                lambda i: F.xxhash64(s.substr(i, F.lit(k))),
            ),
            lambda hashes: F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(hashes) - F.lit(window - 1)),
                    lambda j: F.array_min(F.slice(hashes, j, window)),
                )
            ),
        ),
    )
    # The guard also keeps sequence() ascending: with length ≥ k+window-1
    # both inner sequence stops are ≥ 1 (sequence(1, 0) would DESCEND).
    # CaseWhen evaluates lazily per row, so short docs never reach `fps`.
    return F.when(
        F.length(c) < k + window - 1, F.array().cast("array<bigint>")
    ).otherwise(fps)


def ngram_list(col: str | Column, n: int = 2) -> Column:
    """Word n-gram array in document order, duplicates KEPT (the
    repetition-metrics input — frequency counting needs multiplicity).
    Lowercased whitespace tokens; built with transform over a token-index
    sequence: JVM-side, no UDF."""
    toks = _tokens(F.lower(_c(col)))
    n_sh = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    idx = F.sequence(F.lit(0), n_sh - 1)
    return F.when(n_sh <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )


def shingles(col: str | Column, n: int = 3) -> Column:
    """Word n-gram shingle array (distinct) — the MinHash/Jaccard input."""
    return F.array_distinct(ngram_list(col, n))


def shingle_array_udf(n: int = 3):
    """Arrow-batched twin of :func:`shingles`: text → DISTINCT word
    n-gram array (lowercased whitespace tokens, space-joined — byte-for-
    byte the same gram strings, so ``xxhash64(gram)`` keys and MinHash/
    SimHash signatures are IDENTICAL to the column-expression form; only
    the array's element order differs, which every consumer is
    insensitive to: min/sum aggregates, set intersection).

    Exists because the column form's per-index ``transform(sequence,
    slice+concat_ws)`` runs in Spark's interpreted lambda evaluator
    (~10 µs/element; building sf0.1's gram arrays alone costs seconds —
    measurements in ``operators/quality.py``), while this is a tight
    Python loop over Arrow batches. Use the column form inside pure-SQL
    oracle twins; use this on the hot engine paths."""

    def fn(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = py_tokens(t)
            out.append(
                list({" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)})
            )
        return pd.Series(out)

    return F.pandas_udf(fn, "array<string>")


def winnow_fingerprint_udf(k: int = 25, window: int = 8):
    """Arrow-batched twin of :func:`winnow_fingerprints` for the hot
    dedup path: numpy-vectorized rolling byte-k-gram hashes with
    sliding-window-min selection (distinct survivors, array<bigint>).

    Hash VALUES differ from the column form (polynomial-mod-2⁶⁴ over
    utf-8 BYTES here vs xxhash64 over char substrings there — xxhash64
    has no Python twin), but the winnowing guarantee is hash-agnostic:
    equal substrings hash equally under any deterministic scheme, so any
    shared substring of length ≥ window+k-1 still forces ≥ 1 shared
    fingerprint. Use whichever side of the pair the consumer needs —
    never MIX the two forms in one comparison.

    Normalization matches the column form: ASCII-whitespace runs
    collapse to one space, ends trimmed, lowercased. Docs shorter than
    k+window-1 normalized chars yield an empty array.
    """
    import numpy as np

    # FNV-ish odd multiplier; powers wrap mod 2^64 BY DESIGN. Compute
    # them as masked Python ints: numpy raises "overflow in scalar
    # multiply" RuntimeWarning on scalar uint64 wraparound, and keeping
    # the suite warning-clean means a real (unintended) overflow
    # elsewhere can't hide behind this one. The later array products
    # (grams * powers) wrap silently per C unsigned semantics — only
    # scalar ops warn.
    base = 1099511628211
    mask = (1 << 64) - 1
    powers_int = [0] * k
    powers_int[k - 1] = 1
    for i in range(k - 2, -1, -1):
        powers_int[i] = (powers_int[i + 1] * base) & mask
    powers = np.array(powers_int, dtype=np.uint64)

    def fn(texts: pd.Series) -> pd.Series:
        from numpy.lib.stride_tricks import sliding_window_view

        out = []
        for t in texts:
            norm = _ASCII_WS.sub(" ", (t or "").lower()).strip()
            data = np.frombuffer(norm.encode("utf-8"), dtype=np.uint8)
            if len(data) < k + window - 1:
                out.append([])
                continue
            grams = sliding_window_view(data, k).astype(np.uint64)
            hashes = (grams * powers).sum(axis=1, dtype=np.uint64)
            mins = sliding_window_view(hashes, window).min(axis=1)
            out.append(np.unique(mins).view(np.int64).tolist())
        return pd.Series(out)

    return F.pandas_udf(fn, "array<bigint>")
