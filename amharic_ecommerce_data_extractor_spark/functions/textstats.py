"""Text-analysis column functions for training-data pipelines (graft-added):
language-ID heuristic, quality scoring, token counting (whitespace + BPE-ish
regex), and document fingerprinting. All pure JVM expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# script-detection character classes
_ETHIOPIC = r"[\x{1200}-\x{137F}]"
_LATIN = r"[A-Za-z]"
_CJK = r"[\x{4E00}-\x{9FFF}]"
_CYRILLIC = r"[\x{0400}-\x{04FF}]"
_ARABIC = r"[\x{0600}-\x{06FF}]"


def _count_matches(col, pattern: str) -> Column:
    return F.length(col) - F.length(F.regexp_replace(col, f"(?U){pattern}", ""))


def script_profile(col) -> Column:
    """struct of per-script character fractions (of non-space chars)."""
    base = F.greatest(F.length(F.regexp_replace(col, r"(?U)\s", "")), F.lit(1))
    return F.struct(
        (_count_matches(col, _ETHIOPIC) / base).alias("ethiopic"),
        (_count_matches(col, _LATIN) / base).alias("latin"),
        (_count_matches(col, _CJK) / base).alias("cjk"),
        (_count_matches(col, _CYRILLIC) / base).alias("cyrillic"),
        (_count_matches(col, _ARABIC) / base).alias("arabic"),
    )


def detect_script(col, min_fraction: float = 0.4) -> Column:
    """Dominant script label ('am' for Ethiopic, 'latin', 'cjk', 'cyrillic',
    'arabic', else 'other') — the n-gram-free language-ID heuristic."""
    p = script_profile(col)
    pairs = [("am", p["ethiopic"]), ("latin", p["latin"]), ("cjk", p["cjk"]),
             ("cyrillic", p["cyrillic"]), ("arabic", p["arabic"])]
    best_label = F.lit("other")
    best_score = F.lit(float(min_fraction))
    for label, score in pairs:
        cond = score > best_score
        best_label = F.when(cond, F.lit(label)).otherwise(best_label)
        best_score = F.when(cond, score).otherwise(best_score)
    return best_label


def whitespace_token_count(col) -> Column:
    return F.size(F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != ""))


BPE_ISH_PATTERN = r"(?U)\w+|[^\w\s]"


def bpe_ish_token_count(col) -> Column:
    """Count of word-or-symbol tokens (a cheap proxy for subword token
    budgeting: words + standalone punctuation/symbols)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0))


def quality_score(col) -> Column:
    """Composite [0,1] quality heuristic: penalizes extreme length, high
    punctuation density, low alphabetic density and word repetition."""
    length = F.length(col)
    words = F.filter(F.split(F.trim(F.lower(col)), r"\s+"), lambda t: t != "")
    n_words = F.greatest(F.size(words), F.lit(1))
    uniq_ratio = F.size(F.array_distinct(words)) / n_words
    punct_density = _count_matches(col, r"[^\w\s]") / F.greatest(length, F.lit(1))
    alpha_density = (_count_matches(col, _LATIN) + _count_matches(col, _ETHIOPIC)) \
        / F.greatest(length, F.lit(1))
    len_ok = F.when((length >= 20) & (length <= 20000), F.lit(1.0)).otherwise(F.lit(0.3))
    return F.round(
        0.3 * len_ok
        + 0.3 * uniq_ratio
        + 0.3 * F.least(alpha_density * 1.25, F.lit(1.0))
        + 0.1 * (1.0 - F.least(punct_density * 4, F.lit(1.0))),
        6,
    )


def content_fingerprint(col) -> Column:
    """Stable document fingerprint: xxhash64 over the whitespace-normalized,
    lowercased text (the 'rolling hash' role; exact-dup keying)."""
    return F.xxhash64(F.regexp_replace(F.lower(F.trim(col)), r"(?U)\s+", " "))


def stopword_ratio(col, stopwords: list[str]) -> Column:
    words = F.filter(F.split(F.trim(F.lower(col)), r"\s+"), lambda t: t != "")
    sw = F.array(*[F.lit(w) for w in stopwords])
    hits = F.size(F.filter(words, lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(F.size(words), F.lit(1))
