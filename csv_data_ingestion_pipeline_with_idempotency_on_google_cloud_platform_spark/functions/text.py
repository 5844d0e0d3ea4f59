"""Text-analysis column expressions — extension X4 (SURVEY.md §2b).

All pure JVM-side expressions (whole-stage codegen, no UDFs): language
ID via character-class / stopword heuristics, quality scoring via
length/punctuation/stopword ratios, token counting via regex split,
document fingerprinting via content hashes. Designed to run over a
100 TB `documents` table as a single narrow projection pass — no
shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_text_col(text: Column | str) -> Column:
    """Canonical form for hashing/dedup: collapse whitespace, trim, lower."""
    return F.lower(F.trim(F.regexp_replace(_c(text), r"\s+", " ")))


def content_hash_col(text: Column | str) -> Column:
    """SHA-256 over normalized text — the exact-dedup key (X1), a direct
    generalization of the reference's content-addressed upload_id
    (main.py:15-18)."""
    return F.sha2(normalize_text_col(text), 256)


def tokens_col(text: Column | str) -> Column:
    """Whitespace tokenization; empty/blank text → empty array.

    Strip uses a regex, not `trim` — `trim` removes only 0x20 spaces, so
    tab/newline-padded text would otherwise yield phantom '' tokens.
    """
    t = F.regexp_replace(_c(text), r"^\s+|\s+$", "")
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count_col(text: Column | str) -> Column:
    return F.size(tokens_col(text)).cast("long")


# A small, fixed English stopword inventory used by the heuristics below.
_EN_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


# PII patterns, written in the Java∩RE2 common subset (no lookaround)
# so the engine and the DuckDB oracle apply byte-identical rules.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
LONG_NUMBER_PATTERN = r"\d[\d \-]{6,}\d"  # phone/card-shaped digit runs


def redact_pii_col(text: Column | str) -> Column:
    """Corpus-cleaning PII scrub: emails → <EMAIL>, long digit runs →
    <NUMBER>. Order matters (emails first, so their digits aren't
    half-eaten); pure JVM regexp_replace — no Python in the hot path."""
    t = F.regexp_replace(_c(text), EMAIL_PATTERN, "<EMAIL>")
    return F.regexp_replace(t, LONG_NUMBER_PATTERN, "<NUMBER>")


def pii_counts_cols(text: Column | str) -> dict[str, Column]:
    """Match counts per PII class (for corpus audit reports)."""
    return {
        "n_emails": F.size(F.regexp_extract_all(_c(text), F.lit(EMAIL_PATTERN), F.lit(0))),
        "n_long_numbers": F.size(
            F.regexp_extract_all(_c(text), F.lit(LONG_NUMBER_PATTERN), F.lit(0))
        ),
    }


# GPT-2-style pretokenizer classes, minus lookaheads (RE2, used by the
# DuckDB oracle, has no lookahead): optional leading space + a run of
# letters | digits | other-non-space; bare whitespace runs count as one.
BPE_ISH_PATTERN = r" ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count_col(text: Column | str) -> Column:
    """BPE-ish token count: matches of the GPT-2-style pretokenizer
    regex. Upper-bounds true BPE token counts (each match splits into
    ≥1 BPE tokens) and is the standard cheap budget estimator for
    pack-sizing; pure JVM regex, no Python."""
    return F.size(F.regexp_extract_all(_c(text), F.lit(BPE_ISH_PATTERN), F.lit(0)))


def lang_id_col(text: Column | str) -> Column:
    """Heuristic language ID:

    - Thai codepoints present → 'th'
    - CJK codepoints present → 'zh'
    - Cyrillic → 'ru'
    - else: any English stopword token present → 'en', otherwise 'unknown'
    """
    t = _c(text)
    en_hit = F.arrays_overlap(
        tokens_col(F.lower(t)), F.array(*[F.lit(w) for w in _EN_STOPWORDS])
    )
    return (
        F.when(t.rlike(r"[฀-๿]"), F.lit("th"))
        .when(t.rlike(r"[一-鿿]"), F.lit("zh"))
        .when(t.rlike(r"[Ѐ-ӿ]"), F.lit("ru"))
        .when(en_hit, F.lit("en"))
        .otherwise(F.lit("unknown"))
    )


def quality_score_cols(text: Column | str) -> dict[str, Column]:
    """Quality-scoring signal set: returns named columns
    (n_chars, n_tokens, punct_ratio, stopword_ratio, alpha_ratio,
    quality_score). All ratios in [0,1]; score is a fixed linear blend.
    """
    t = _c(text)
    n_chars = F.length(t).cast("long")
    n_tokens = token_count_col(t)
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"([\.,;:!\?])"), 1)).cast("double")
    n_alpha = F.size(F.regexp_extract_all(t, F.lit(r"([A-Za-z])"), 1)).cast("double")
    toks = tokens_col(t)
    n_stop = F.size(
        F.filter(toks, lambda x: F.lower(x).isin(*_EN_STOPWORDS))
    ).cast("double")
    safe_chars = F.greatest(n_chars.cast("double"), F.lit(1.0))
    safe_toks = F.greatest(n_tokens.cast("double"), F.lit(1.0))
    punct_ratio = n_punct / safe_chars
    alpha_ratio = n_alpha / safe_chars
    stopword_ratio = n_stop / safe_toks
    # Fixed blend: reward alpha density + stopword presence, punish
    # punctuation soup and degenerate length.
    quality = (
        F.lit(0.4) * alpha_ratio
        + F.lit(0.4) * F.least(stopword_ratio * 2, F.lit(1.0))
        + F.lit(0.2) * (F.lit(1.0) - F.least(punct_ratio * 4, F.lit(1.0)))
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stopword_ratio,
        "alpha_ratio": alpha_ratio,
        "quality_score": quality,
    }


def repetition_cols(text: Column | str) -> dict[str, Column]:
    """Intra-document repetition signals (Gopher-style corpus quality
    rules): fraction of duplicated lines and of duplicated word bigrams.
    Boilerplate/spam pages repeat themselves; clean prose does not.
    Pure per-row expressions — zero shuffle at any scale.

    dup_line_frac  = 1 - |distinct lines| / |lines|
    dup_bigram_frac = 1 - |distinct bigrams| / |bigrams| (0 when < 2 tokens)
    """
    t = _c(text)
    lines = F.split(t, "\n")
    n_lines = F.size(lines).cast("double")
    dup_line_frac = (n_lines - F.size(F.array_distinct(lines)).cast("double")) / (
        F.greatest(n_lines, F.lit(1.0))
    )
    toks = tokens_col(t)
    n_bi = (F.size(toks) - 1).cast("double")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - 1, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
    )
    dup_bigram_frac = F.when(n_bi < 1, F.lit(0.0)).otherwise(
        (n_bi - F.size(F.array_distinct(bigrams)).cast("double")) / n_bi
    )
    return {"dup_line_frac": dup_line_frac, "dup_bigram_frac": dup_bigram_frac}


def rolling_fingerprint_col(text: Column | str, shingle: int = 8) -> Column:
    """Document fingerprint: min over rolling character-shingle hashes
    (winnowing-style, one representative hash per document). Pure
    expression: sequence → transform(substring) → xxhash64 → array_min.
    """
    norm = normalize_text_col(text)
    n = F.length(norm)
    starts = F.sequence(F.lit(1), F.greatest(n - shingle + 1, F.lit(1)))
    hashes = F.transform(starts, lambda i: F.xxhash64(norm.substr(i, F.lit(shingle))))
    return F.array_min(hashes)
