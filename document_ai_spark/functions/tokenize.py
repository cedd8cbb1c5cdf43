"""Script-aware tokenization shared by the text-op family.

The round-3 token model — ``split(trim(text), '\\s+')`` — treats a CJK
document as ONE token: Chinese/Japanese/Korean scripts don't separate
words with spaces, so word-shingling, stopword ratios, quality scores,
the unigram LM, and MinHash dedup all degenerate to a single giant
"word". A real web-scale corpus is heavily CJK, so every operator now
tokenizes with ONE shared rule:

  * a single CJK character (kana, Hangul syllables, unified ideographs
    + extension A + compatibility ideographs) is a token by itself —
    k-token shingles over CJK text therefore become character k-grams,
    the standard LSH/dedup practice for no-space scripts;
  * everything else tokenizes as maximal runs of non-space, non-CJK
    characters — byte-identical to the old whitespace split on spaced
    scripts (Latin, Cyrillic, Greek, Arabic, Devanagari, ...), so
    existing English-corpus results are unchanged.

The ONE behavioral edge vs the old split: empty / whitespace-only text
now yields ZERO tokens (the old split yielded one empty-string token).
Consumers guard divisions with greatest(n, 1); both engines mirror.

Engine parity: the pattern uses only literal ``\\x{hhhh}`` BMP
code-point ranges, which Java regex (Spark) and RE2 (DuckDB) interpret
identically — verified by the parity tests in tests/test_cjk_tokenize.py.
Unicode *script names* (\\p{IsHan} vs \\p{Han}) are spelled differently
across the two engines, so we avoid them entirely. Supplementary-plane
ideographs (CJK ext B+, U+20000+) are out of scope of the class and fall
into the run rule; acceptable approximation, documented here.

Scope note — other no-space scripts (Thai, Lao, Khmer, Myanmar) keep
the run rule: each run is one token, the pre-round-4 behavior. Char
tokens would be wrong there (those scripts are combining-mark heavy, so
chars are not grapheme-sized units the way CJK ideographs are), and
proper segmentation needs dictionaries this environment does not ship.
A cluster deployment adds their ranges or plugs a real segmenter at the
tokens_sql seam; everything downstream is token-model-agnostic.

Everything stays a JVM/codegen regexp expression — no Python in the hot
path; the corpus streams once per op exactly as before.
"""
from __future__ import annotations

from pyspark.sql import Column, functions as F

# Whitespace, spelled EXPLICITLY: Java regex \s is [ \t\n\x0B\f\r] but
# RE2's \s excludes \x0B (vertical tab) — a real divergence found by the
# cross-engine fuzz test (test_cjk_tokenize.py). Both engines read this
# class identically, so no bare \s appears in any shared pattern. The
# set equals Java's \s, which keeps the hybrid split() fast path exact.
WS_RANGES = r" \x{0009}-\x{000D}"

# BMP CJK ranges, single-backslash (raw-regex) spelling:
#   3040-30FF  Hiragana + Katakana
#   3400-4DBF  CJK Unified Ideographs Extension A
#   4E00-9FFF  CJK Unified Ideographs
#   AC00-D7AF  Hangul Syllables
#   F900-FAFF  CJK Compatibility Ideographs
CJK_RANGES = (r"\x{3040}-\x{30FF}\x{3400}-\x{4DBF}"
              r"\x{4E00}-\x{9FFF}\x{AC00}-\x{D7AF}\x{F900}-\x{FAFF}")

# A maximal run of non-space/non-CJK chars OR one CJK char. The two
# branches match disjoint first-characters, so alternation order cannot
# change the result — but run-first is measurably faster (~2x on Latin
# corpora: the common case matches on the first branch).
TOKEN_PATTERN = f"[^{WS_RANGES}{CJK_RANGES}]+|[{CJK_RANGES}]"

# Alphabetic ranges whose words BPE-merge at ~4 chars/token (the
# token-estimate letter model): Basic Latin + Latin-1/Extended + Greek +
# Cyrillic + Hebrew + Arabic + Devanagari.
ALPHA_RANGES = (r"A-Za-z\x{00C0}-\x{024F}\x{0370}-\x{03FF}"
                r"\x{0400}-\x{04FF}\x{0590}-\x{05FF}"
                r"\x{0600}-\x{06FF}\x{0900}-\x{097F}")


def _sql_quote(pattern: str) -> str:
    """Escape a raw regex for embedding in a Spark SQL string literal
    (Spark SQL processes backslash escapes; DuckDB literals do not)."""
    return pattern.replace("\\", "\\\\")


def tokens_sql(col: str = "text") -> str:
    """Spark SQL expression text: the token array of ``col``.

    Hybrid fast path: rows with no CJK character tokenize by the old
    whitespace split (minus empty strings) — provably identical to the
    run-first regex on such rows, since the run branch [^\\s cjk]+ then
    degenerates to [^\\s]+, exactly the split's complement — and ~20%
    faster on Latin-dominated corpora (measured on the minhash path at
    sf0.1). Rows containing CJK take the full pattern. The rlike guard
    is a cheap scan; equivalence is pinned by
    tests/test_cjk_tokenize.py::test_hybrid_equals_pure_regex."""
    pat = _sql_quote(TOKEN_PATTERN)
    cjk = _sql_quote(CJK_RANGES)
    return (f"CASE WHEN {col} rlike '[{cjk}]' "
            f"THEN regexp_extract_all({col}, '{pat}', 0) "
            f"ELSE filter(split(trim({col}), '\\\\s+'), x -> x != '') END")


def tokens_regex_sql(col: str = "text") -> str:
    """The pure single-regex Spark form (no fast path) — the canonical
    definition the hybrid must match."""
    return f"regexp_extract_all({col}, '{_sql_quote(TOKEN_PATTERN)}', 0)"


def duck_tokens_sql(col: str = "text") -> str:
    """DuckDB SQL expression text for the SAME token array (RE2 reads
    the identical pattern; DuckDB string literals keep backslashes)."""
    return f"regexp_extract_all({col}, '{TOKEN_PATTERN}', 0)"


def tokens_col(text=None) -> Column:
    """Column form of the token array (same hybrid fast path as
    tokens_sql; patterns ride as literals)."""
    col = text if text is not None else F.col("text")
    if isinstance(col, str):
        col = F.col(col)
    return (F.when(col.rlike(f"[{CJK_RANGES}]"),
                   F.regexp_extract_all(col, F.lit(TOKEN_PATTERN), F.lit(0)))
            .otherwise(F.filter(F.split(F.trim(col), r"\s+"),
                                lambda x: x != "")))
