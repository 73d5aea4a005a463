"""Amharic preprocessing as pure Spark Column expressions — the JVM
whole-stage-codegen fast path of kernels/textprep.py (zero Python, zero Arrow
transfer).

Semantics identical to the kernel/reference chain with ONE caveat: there is
no NFC normalization builtin in Spark SQL, so this path assumes NFC input
(true for virtually all Telegram text; the Arrow-kernel backend handles the
general case). Equality against the kernel is pinned by tests on the full
synthetic corpus.

Java-regex ↔ Python-regex parity notes (the bugs you'd hit otherwise):
* Java's \\w and \\s are ASCII-only by default while Python's are
  Unicode-aware — every pattern here carries the (?U) UNICODE_CHARACTER_CLASS
  flag to match the reference.
* Spark `translate` is a simultaneous single-pass map, so the glyph table is
  the precomputed fix-point of the reference's sequential passes
  (kernels.textprep._effective_char_map).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from ..kernels.textprep import _CHAR_TABLE, _GEEZ_NUMERALS, TOKENIZER_PUNCT

_CHAR_SRC = "".join(chr(k) for k in _CHAR_TABLE)
_CHAR_DST = "".join(_CHAR_TABLE[k] for k in _CHAR_TABLE)

_PUNCT_SRC = "።፣፤፧፡፦!"
_PUNCT_DST = ".,;?:-."

_TOKEN_PUNCT_CLASS = (
    "[" + TOKENIZER_PUNCT.replace("\\", "\\\\").replace("]", "\\]").replace("[", "\\[")
    .replace("^", "\\^").replace("-", "\\-") + "]"
)


def fold_char_variants_expr(col) -> Column:
    return F.translate(col, _CHAR_SRC, _CHAR_DST)


def geez_digits_expr(col) -> Column:
    out = col
    for k, v in _GEEZ_NUMERALS:  # ordered longest-first ('፰፻' before singles)
        out = F.regexp_replace(out, k, v)
    return out


def strip_urls_mentions_hashtags_expr(col) -> Column:
    out = F.regexp_replace(col, r"(?U)https?://\S+|www\.\S+", " ")
    out = F.regexp_replace(out, r"(?U)@\w+", " ")
    return F.regexp_replace(out, r"(?U)#\w+", " ")


def strip_non_amharic_expr(col) -> Column:
    return F.regexp_replace(col, r"(?U)[^\x{1200}-\x{137F}\x20-\x7E\s]+", " ")


def normalize_punct_expr(col) -> Column:
    out = F.translate(col, _PUNCT_SRC, _PUNCT_DST)
    for ch in ".?!,;:-":
        esc = "\\" + ch
        out = F.regexp_replace(out, f"{esc}{{2,}}", ch)
    # punct-space-punct collapses to the first group ($1, Java replacement)
    return F.regexp_replace(out, r"(?U)([.?!,;:\-]+)\s*([.?!,;:\-]+)", "$1")


def collapse_whitespace_expr(col) -> Column:
    return F.trim(F.regexp_replace(col, r"(?U)\s+", " "))


def preprocess_expr(col) -> Column:
    """Full chain (reference order, NFC assumed). One codegen'd projection."""
    out = F.coalesce(col, F.lit(""))
    out = fold_char_variants_expr(out)
    out = geez_digits_expr(out)
    out = strip_urls_mentions_hashtags_expr(out)
    out = strip_non_amharic_expr(out)
    out = normalize_punct_expr(out)
    return collapse_whitespace_expr(out)


def tokenize_expr(col) -> Column:
    """Tokenizer as expressions: pad punctuation, split digit↔non-digit
    boundaries, split on spaces, drop empties."""
    out = collapse_whitespace_expr(col)
    out = F.regexp_replace(out, f"(?U)({_TOKEN_PUNCT_CLASS})", " $1 ")
    out = F.regexp_replace(out, r"(?U)(\d)([^\d\s])", "$1 $2")
    out = F.regexp_replace(out, r"(?U)([^\d\s])(\d)", "$1 $2")
    out = collapse_whitespace_expr(out)
    return F.filter(F.split(out, " "), lambda t: t != "")
