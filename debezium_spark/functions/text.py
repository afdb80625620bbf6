"""Text analysis operators: tokenization, quality scoring, language ID,
fingerprinting.

All pure column expressions (JVM-side, whole-stage codegen) — these run
per-document with no shuffle, so they scale linearly with input size
and pipeline directly into the parquet scan (predicate/column pruning
intact). Deterministic and engine-portable: every hash bottoms out in
``md5`` so a DuckDB oracle can reproduce results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small multilingual stopword marker lists for the n-gram/stopword
# language-ID heuristic. Deterministic; no model download.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "es": ("el", "la", "de", "que", "y", "los"),
    "fr": ("le", "la", "les", "de", "et", "un"),
    "de": ("der", "die", "und", "das", "ein", "ist"),
    "zh": ("的", "是", "了", "我"),
}

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def tokens(text: Column) -> Column:
    """Whitespace tokenization of lowercased text (empty-safe)."""
    return F.filter(
        F.split(F.lower(F.trim(text)), "\\s+"), lambda t: t != F.lit("")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """Approximate BPE token count: split on word boundaries AND
    punctuation (a regex stand-in for a real tokenizer; ~chars/4 for
    prose). Portable: pure regexp count."""
    pieces = F.filter(
        F.split(text, "(?<=\\W)|(?=\\W)"), lambda t: F.trim(t) != F.lit("")
    )
    return F.size(pieces).cast("long")


def stopword_ratio(text: Column) -> Column:
    toks = tokens(text)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return F.round(n_stop / F.greatest(F.size(toks), F.lit(1)), 6)


def alpha_ratio(text: Column) -> Column:
    """Fraction of characters that are ASCII letters or space."""
    kept = F.length(F.regexp_replace(text, "[^A-Za-z ]", ""))
    return F.round(kept / F.greatest(F.length(text), F.lit(1)), 6)


def mean_word_length(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return F.round(total / F.greatest(F.size(toks), F.lit(1)), 6)


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword
    presence + alphabetic density + sane mean word length. The same
    shape as production quality filters (C4/Gopher rules), reduced to
    deterministic arithmetic."""
    n = token_count(text)
    len_ok = (n >= 20) & (n <= 100_000)
    mwl = mean_word_length(text)
    mwl_ok = (mwl >= 2.0) & (mwl <= 12.0)
    score = (
        len_ok.cast("double") * 0.4
        + mwl_ok.cast("double") * 0.2
        + stopword_ratio(text) * 0.2
        + alpha_ratio(text) * 0.2
    )
    return F.round(score, 6)


def _marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def lang_id(text: Column) -> Column:
    """Stopword-marker language ID: score each language by marker-token
    hits, pick argmax (deterministic tie-break: first code in sorted
    order wins). A real system would use fastText; the heuristic keeps
    the operator shape (per-doc score argmax) with zero dependencies."""
    toks = tokens(text)
    # (hits, -position, code): array_max picks highest hits, ties go to
    # the earliest code in sorted order.
    scored = [
        F.struct(
            _marker_hits(toks, LANG_MARKERS[code]).alias("hits"),
            F.lit(-i).alias("prio"),
            F.lit(code).alias("code"),
        )
        for i, code in enumerate(sorted(LANG_MARKERS))
    ]
    best = F.array_max(F.array(*scored))
    return F.when(
        best.getField("hits") > 0, best.getField("code")
    ).otherwise(F.lit("und"))


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse
    whitespace, strip."""
    return F.trim(F.regexp_replace(F.lower(text), "\\s+", " "))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint = md5 of normalized text.
    (md5 is portable across Spark/DuckDB; a rolling-hash variant is in
    :mod:`debezium_spark.functions.dedup` as simhash.)"""
    return F.md5(normalize_text(text))


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles of the normalized text. The unit set
    for Jaccard/MinHash dedup."""
    toks = tokens(text)
    k = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(k - n, F.lit(0)))
    sh = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")
    )
    return F.when(k >= n, F.array_distinct(sh)).otherwise(
        F.when(k > 0, F.array(F.array_join(toks, " "))).otherwise(
            F.array().cast("array<string>")
        )
    )


# --- PII redaction ---------------------------------------------------
# Reference analogue: the column maskers applied at source
# (relational/mapping/MaskStrings.java) — value-level scrubbing before
# events leave the pipeline. For LLM training data the same slot is
# PII redaction. Patterns are RE2-safe (no lookaround, no alternation
# ambiguity) so Spark (Java regex) and DuckDB (RE2) match identically.
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_IPV4 = (
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
)
PII_PHONE = "\\+[0-9][0-9() -]{6,}[0-9]"


def pii_count(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0)).cast(
        "long"
    )


def pii_redact(text: Column) -> Column:
    """Replace emails, IPv4 addresses, and international phone numbers
    with typed placeholders. Order fixed (email → ip → phone) so the
    passes compose deterministically; pure codegen, no shuffle."""
    t = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    t = F.regexp_replace(t, PII_IPV4, "<IP>")
    return F.regexp_replace(t, PII_PHONE, "<PHONE>")


# --- Repetition filtering (Gopher-style) -----------------------------

REPETITION_TOKEN_CAP = 2048


def capped_tokens(text: Column, cap: int = REPETITION_TOKEN_CAP) -> Column:
    """First ``cap`` tokens — bounds per-document work by construction
    (same discipline as the near-dup ``max_postings`` caps): repetition
    stats on a 10^10-doc corpus must not be quadratic in pathological
    document length."""
    return F.slice(tokens(text), 1, cap)


def bigrams(toks: Column) -> Column:
    """Adjacent token pairs, computed positionally (no shuffle, no
    self-join): token i joined with token i+1."""
    n = F.size(toks)
    bg = F.transform(
        toks,
        lambda x, i: F.when(
            i < n - 1, F.concat(x, F.lit(" "), F.get(toks, i + 1))
        ),
    )
    return F.filter(bg, lambda b: b.isNotNull())


def _chars(arr: Column) -> Column:
    return F.aggregate(
        arr, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )


def dup_fraction_micro(arr: Column) -> Column:
    """``floor((|arr| - |distinct(arr)|) / |arr| * 1e6)`` — the
    fraction of elements that are repeat occurrences, in integer
    micro-units. Linear in |arr| (hash-based array_distinct)."""
    n = F.size(arr)
    nd = F.size(F.array_distinct(arr))
    return F.floor(
        (n - nd).cast("double") / F.greatest(n, F.lit(1)) * 1e6
    ).cast("long")


def dup_char_fraction_micro(arr: Column) -> Column:
    """Char-mass variant: fraction of characters inside repeat
    occurrences (Gopher's duplicate-line character fraction, applied
    to tokens)."""
    total = _chars(arr)
    dist = _chars(F.array_distinct(arr))
    return F.floor(
        (total - dist).cast("double")
        / F.greatest(total, F.lit(1))
        * 1e6
    ).cast("long")


def portable_hash32(col: Column, salt: str | int = "") -> Column:
    """32-bit deterministic hash reproducible in any engine with md5:
    ``int(md5(salt|x)[:8], 16)``. Used where a DuckDB oracle must match
    the hash value exactly; xxhash64 stays the scale-path default."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(str(salt)), F.lit("|"), col)), 1, 8),
        16,
        10,
    ).cast("long")


def bitlen(col: Column) -> Column:
    """floor(log2(x)) + 1 for x >= 1, computed EXACTLY in both Spark
    and DuckDB as the length of the binary representation — the
    integer-portable log2 the oracles need (libm log() rounding
    differs between JVMs and DuckDB, bin() cannot)."""
    return F.length(F.bin(col)).cast("long")


# Gopher quality-filter stop words (Rae et al. 2021, Appendix A1.1 —
# the published rule is "contains at least 2 of these 8").
GOPHER_STOPWORDS = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_stats(text: Column) -> dict[str, Column]:
    """The word-level Gopher quality-filter signals (Rae et al. 2021,
    Appendix A1.1 published rules), exact integer micro-units:

    - word count in [50, 100_000]
    - mean word length in [3, 10] characters
    - symbol-to-word ratio ('#' and '...') <= 0.1
    - >= 80% of words contain an alphabetic character
    - >= 2 of the 8 Gopher stop words present

    The two line-shape rules (bullet-start / ellipsis-end line
    fractions) need a line-structured input and are covered by the
    line-grain operators instead. Pure codegen projection — no
    shuffle, pipelines into the parquet scan.
    """
    toks = tokens(text)
    n_words = F.size(toks).cast("long")
    denom = F.greatest(n_words, F.lit(1))
    char_mass = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    mean_word_len_micro = (
        F.floor(char_mass.cast("double") * 1e6 / denom).cast("long")
    )
    n_hash = F.length(text) - F.length(F.regexp_replace(text, "#", ""))
    n_ellipsis = F.floor(
        (
            F.length(text)
            - F.length(F.regexp_replace(text, "\\.\\.\\.", ""))
        )
        / 3
    ).cast("long")
    symbol_word_micro = (
        F.floor((n_hash + n_ellipsis).cast("double") * 1e6 / denom)
        .cast("long")
    )
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    alpha_word_micro = (
        F.floor(alpha_words.cast("double") * 1e6 / denom).cast("long")
    )
    n_stop = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            lambda m: F.array_contains(toks, m),
        )
    ).cast("long")
    keep = (
        (n_words >= 50)
        & (n_words <= 100_000)
        & (mean_word_len_micro >= 3_000_000)
        & (mean_word_len_micro <= 10_000_000)
        & (symbol_word_micro <= 100_000)
        & (alpha_word_micro >= 800_000)
        & (n_stop >= 2)
    )
    return {
        "n_words": n_words,
        "mean_word_len_micro": mean_word_len_micro,
        "symbol_word_micro": symbol_word_micro,
        "alpha_word_micro": alpha_word_micro,
        "n_stop_gopher": n_stop,
        "keep": keep,
    }
