"""Script-aware tokenization shared by the text-op family.

The round-3 token model — ``split(trim(text), '\\s+')`` — treats a CJK
document as ONE token: Chinese/Japanese/Korean scripts don't separate
words with spaces, so word-shingling, stopword ratios, quality scores,
the unigram LM, and MinHash dedup all degenerate to a single giant
"word". A real web-scale corpus is heavily CJK, so every operator now
tokenizes with ONE shared rule:

  * a single CJK character (kana incl. phonetic extensions and
    halfwidth katakana, Hangul syllables, unified ideographs +
    extension A + compatibility ideographs) is a token by itself —
    k-token shingles over CJK text therefore become character k-grams,
    the standard LSH/dedup practice for no-space scripts;
  * Thai / Lao / Khmer / Myanmar (no-space, combining-mark-heavy
    scripts where bare chars are NOT grapheme-sized) tokenize by a
    deterministic GRAPHEME-CLUSTER approximation: optional leading
    vowel + base character + trailing combining marks is one token
    (round-5; pre-round-5 these fell into the run rule and a whole
    Thai sentence was one token). Digits/signs/stray marks in those
    blocks are single-char tokens. This is the documented fallback of
    the segmenter seam below — real dictionary segmentation plugs in
    via set_segmenter() on clusters that ship one;
  * everything else tokenizes as maximal runs of non-space, non-CJK,
    non-SEA characters — byte-identical to the old whitespace split on
    spaced scripts (Latin, Cyrillic, Greek, Arabic, Devanagari, ...),
    so existing English-corpus results are unchanged.

Whitespace now includes U+3000 IDEOGRAPHIC SPACE (round-5 ADVICE fix:
real Japanese text separates runs with U+3000; it previously formed
'　' run-tokens that inflated n_tokens and entered shingles). Fullwidth
Latin forms (U+FF01-FF5E) remain ordinary run characters — scope note.

The ONE behavioral edge vs the old split: empty / whitespace-only text
now yields ZERO tokens (the old split yielded one empty-string token).
Consumers guard divisions with greatest(n, 1); both engines mirror.

Engine parity: the pattern uses only literal ``\\x{hhhh}`` BMP
code-point ranges plus ?/* quantifiers, which Java regex (Spark) and
RE2 (DuckDB) interpret identically — verified by the parity tests in
tests/test_cjk_tokenize.py. Unicode *script names* (\\p{IsHan} vs
\\p{Han}) are spelled differently across the two engines, so we avoid
them entirely. Every alternation branch matches a DISJOINT set of
first characters, so the result never depends on alternation-order
semantics. Supplementary-plane ideographs (CJK ext B+, U+20000+) are
out of scope of the class and fall into the run rule; acceptable
approximation, documented here.

Everything stays a JVM/codegen regexp expression — no Python in the hot
path; the corpus streams once per op exactly as before.
"""
from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import Column, functions as F

# Whitespace, spelled EXPLICITLY: Java regex \s is [ \t\n\x0B\f\r] but
# RE2's \s excludes \x0B (vertical tab) — a real divergence found by the
# cross-engine fuzz test (test_cjk_tokenize.py). Both engines read this
# class identically, so no bare \s appears in any shared pattern. The
# set is Java's \s PLUS U+3000 ideographic space; the hybrid split()
# fast path stays exact because its guard routes every row containing
# U+3000 (or any no-space-script char) to the full regex.
WS_RANGES = r" \x{0009}-\x{000D}\x{3000}"

# Engine-parity trim. Spark's trim() strips only U+0020 while DuckDB's
# strips the full Unicode Zs category (incl. NBSP and U+3000) — a real
# verdict-level divergence found by the published-rules fuzz test
# (a U+3000-indented single-word line was "one word" to DuckDB but not
# to Spark). Every shared rule that trims a line before judging it
# must therefore spell the trim explicitly over WS_RANGES: Spark via
# ws_trim() below, DuckDB via regexp_replace(x, WS_STRIP_RE, '', 'g').
WS_STRIP_RE = rf"^[{WS_RANGES}]+|[{WS_RANGES}]+$"


def ws_trim(col) -> "Column":
    """Strip leading/trailing WS_RANGES chars — the engine-parity trim
    (Spark regexp_replace is global, so one alternation pass does both
    ends)."""
    return F.regexp_replace(col, WS_STRIP_RE, "")


def ws_trim_sql(col: str) -> str:
    """The ws_trim() expression as Spark SQL text (for F.expr bodies;
    Spark SQL literals process backslash escapes, so the pattern is
    double-escaped here)."""
    return (f"regexp_replace({col}, "
            f"'{WS_STRIP_RE.replace(chr(92), chr(92) * 2)}', '')")

# BMP CJK ranges, single-backslash (raw-regex) spelling:
#   3040-30FF  Hiragana + Katakana
#   31F0-31FF  Katakana Phonetic Extensions (Ainu small kana)
#   3400-4DBF  CJK Unified Ideographs Extension A
#   4E00-9FFF  CJK Unified Ideographs
#   AC00-D7AF  Hangul Syllables
#   F900-FAFF  CJK Compatibility Ideographs
#   FF66-FF9F  Halfwidth Katakana (incl. ｰ and voicing marks)
CJK_RANGES = (r"\x{3040}-\x{30FF}\x{31F0}-\x{31FF}\x{3400}-\x{4DBF}"
              r"\x{4E00}-\x{9FFF}\x{AC00}-\x{D7AF}\x{F900}-\x{FAFF}"
              r"\x{FF66}-\x{FF9F}")

# South-East-Asian no-space scripts: full blocks (excluded from the run
# branch), split per block into grapheme-leading chars (leads/bases,
# which START a grapheme token) and the rest (single-char tokens:
# digits, signs, currency, stray marks). First-char sets stay disjoint:
# a grapheme branch starts only at a lead/base, the singleton class
# covers exactly the block's other characters.
SEA_BLOCKS = (r"\x{0E00}-\x{0E7F}\x{0E80}-\x{0EFF}"
              r"\x{1000}-\x{109F}\x{1780}-\x{17FF}")
_THAI_GRAPHEME = (r"[\x{0E40}-\x{0E44}]?[\x{0E01}-\x{0E2E}]"
                  r"[\x{0E30}-\x{0E3A}\x{0E45}-\x{0E4E}]*"
                  # isolated leading vowel (no base follows — e.g. the
                  # common 'เเ' digraph spelling of แ, or vowel before
                  # punctuation): its own token rather than silently
                  # DROPPED from the extract_all — a dropped char would
                  # vanish from n_tokens/shingles AND from
                  # strip_dup_spans' token-rejoin rebuild. Ordered
                  # after the vowel+base branch (both engines are
                  # leftmost-first), so full clusters still win.
                  r"|[\x{0E40}-\x{0E44}]")
_LAO_GRAPHEME = (r"[\x{0EC0}-\x{0EC4}]?[\x{0E81}-\x{0EAE}]"
                 r"[\x{0EB0}-\x{0EBD}\x{0EC6}\x{0EC8}-\x{0ECD}]*"
                 r"|[\x{0EC0}-\x{0EC4}]")
_KHMER_GRAPHEME = r"[\x{1780}-\x{17B3}][\x{17B4}-\x{17D3}]*"
_MYANMAR_GRAPHEME = r"[\x{1000}-\x{102A}\x{103F}][\x{102B}-\x{103E}]*"
# Block chars that no grapheme branch can start at -> single-char tokens.
_SEA_SINGLETON = (r"[\x{0E00}\x{0E2F}-\x{0E3F}\x{0E45}-\x{0E7F}"
                  r"\x{0E80}\x{0EAF}-\x{0EBF}\x{0EC5}-\x{0EFF}"
                  r"\x{102B}-\x{103E}\x{1040}-\x{109F}"
                  r"\x{17B4}-\x{17FF}]")

# A maximal run of non-space/non-CJK/non-SEA chars, OR one CJK char, OR
# one SEA grapheme cluster, OR one SEA singleton. TOP-LEVEL branches
# match disjoint first-characters (see module docstring), so their
# order cannot change the result — run-first is just measurably faster
# (~2x on Latin corpora: the common case matches on the first branch).
# The ONE order-sensitive spot is inside the Thai/Lao branches: the
# isolated-leading-vowel fallback shares its first char with the
# vowel+base cluster and must come second; Java regex and RE2 are both
# leftmost-FIRST, so the two engines agree (and the fuzz tests pin it).
TOKEN_PATTERN = (
    f"[^{WS_RANGES}{CJK_RANGES}{SEA_BLOCKS}]+|[{CJK_RANGES}]"
    f"|{_THAI_GRAPHEME}|{_LAO_GRAPHEME}"
    f"|{_KHMER_GRAPHEME}|{_MYANMAR_GRAPHEME}|{_SEA_SINGLETON}"
)

# Chars whose presence routes a row off the whitespace-split fast path:
# every char the full regex treats differently from split(trim, '\s+').
NONSPACED_GUARD = CJK_RANGES + SEA_BLOCKS + r"\x{3000}"

# Alphabetic ranges whose words BPE-merge at ~4 chars/token (the
# token-estimate letter model): Basic Latin + Latin-1/Extended + Greek +
# Cyrillic + Hebrew + Arabic + Devanagari.
ALPHA_RANGES = (r"A-Za-z\x{00C0}-\x{024F}\x{0370}-\x{03FF}"
                r"\x{0400}-\x{04FF}\x{0590}-\x{05FF}"
                r"\x{0600}-\x{06FF}\x{0900}-\x{097F}")


# -- segmenter seam --------------------------------------------------------
# A cluster deployment with a real dictionary segmenter (Thai/Lao/Khmer/
# Myanmar word boundaries need dictionaries this environment does not
# ship) plugs in here: provide SQL-expression builders for both engines
# (and optionally a Column builder); every downstream operator composes
# tokens through these three functions, so the swap is global and
# plan-shaped exactly like the default (token-model-agnostic consumers).
# NOTE: the oracle SQL strings in __spark_entry__ are built at import
# time against the DEFAULT tokenizer — the registry correctness surface
# always grades the default; the seam is a deployment knob.
_SEGMENTER: dict = {"spark": None, "duck": None, "col": None}


def set_segmenter(spark_sql_fn: Callable[[str], str],
                  duck_sql_fn: Optional[Callable[[str], str]] = None,
                  col_fn: Optional[Callable[..., Column]] = None) -> None:
    """Install a custom tokenizer: ``spark_sql_fn(col_name)`` must
    return a Spark SQL expression producing ``array<string>`` tokens;
    ``duck_sql_fn`` its DuckDB twin (omit if no oracle parity needed);
    ``col_fn`` an optional Column-form builder (defaults to wrapping
    the SQL via F.expr on a named column)."""
    _SEGMENTER["spark"] = spark_sql_fn
    _SEGMENTER["duck"] = duck_sql_fn
    _SEGMENTER["col"] = col_fn


def reset_segmenter() -> None:
    """Restore the default script-aware tokenizer."""
    _SEGMENTER["spark"] = _SEGMENTER["duck"] = _SEGMENTER["col"] = None


def _sql_quote(pattern: str) -> str:
    """Escape a raw regex for embedding in a Spark SQL string literal
    (Spark SQL processes backslash escapes; DuckDB literals do not)."""
    return pattern.replace("\\", "\\\\")


def tokens_sql(col: str = "text") -> str:
    """Spark SQL expression text: the token array of ``col``.

    Hybrid fast path: rows with no CJK/SEA/U+3000 character tokenize by
    the old whitespace split (minus empty strings) — provably identical
    to the run-first regex on such rows, since the run branch
    [^\\s cjk sea]+ then degenerates to [^\\s]+, exactly the split's
    complement — and ~20% faster on Latin-dominated corpora (measured
    on the minhash path at sf0.1). Rows containing a guard char take
    the full pattern. The rlike guard is a cheap scan; equivalence is
    pinned by tests/test_cjk_tokenize.py::test_hybrid_equals_pure_regex."""
    if _SEGMENTER["spark"] is not None:
        return _SEGMENTER["spark"](col)
    pat = _sql_quote(TOKEN_PATTERN)
    guard = _sql_quote(NONSPACED_GUARD)
    return (f"CASE WHEN {col} rlike '[{guard}]' "
            f"THEN regexp_extract_all({col}, '{pat}', 0) "
            f"ELSE filter(split(trim({col}), '\\\\s+'), x -> x != '') END")


def tokens_regex_sql(col: str = "text") -> str:
    """The pure single-regex Spark form (no fast path) — the canonical
    definition the hybrid must match."""
    return f"regexp_extract_all({col}, '{_sql_quote(TOKEN_PATTERN)}', 0)"


def duck_tokens_sql(col: str = "text") -> str:
    """DuckDB SQL expression text for the SAME token array (RE2 reads
    the identical pattern; DuckDB string literals keep backslashes)."""
    if _SEGMENTER["duck"] is not None:
        return _SEGMENTER["duck"](col)
    return f"regexp_extract_all({col}, '{TOKEN_PATTERN}', 0)"


def tokens_col(text=None) -> Column:
    """Column form of the token array (same hybrid fast path as
    tokens_sql; patterns ride as literals)."""
    col = text if text is not None else F.col("text")
    if isinstance(col, str):
        col = F.col(col)
    if _SEGMENTER["col"] is not None:
        return _SEGMENTER["col"](col)
    if _SEGMENTER["spark"] is not None:
        # Column inputs can't route through a name-based SQL builder;
        # custom deployments that need Column form pass col_fn.
        raise ValueError("set_segmenter: col_fn required for tokens_col")
    return (F.when(col.rlike(f"[{NONSPACED_GUARD}]"),
                   F.regexp_extract_all(col, F.lit(TOKEN_PATTERN), F.lit(0)))
            .otherwise(F.filter(F.split(F.trim(col), r"\s+"),
                                lambda x: x != "")))
