"""Text-analysis operators over a flat document corpus.

Operate on the driver's `documents(doc_id, text, lang, source, n_chars)`
table. Everything is built-in Catalyst expressions (JVM, codegen) — no
Python in the hot path — and each op has an equivalent DuckDB oracle in
__spark_entry__.py. These are the text-side training-data-pipeline ops the
engine exposes beyond the reference's invoice surface: token counting,
quality scoring, language-ID heuristic, document fingerprinting.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..constants import STOPWORDS
from ..functions.tokenize import (
    ws_trim,
    ALPHA_RANGES,
    CJK_RANGES,
    WS_RANGES,
    _sql_quote,
    tokens_col,
    tokens_sql,
)

# Marker words for the language-ID heuristic. The corpus is synthetic
# word-salad, so this is a deterministic function both engines compute
# identically — which is what the oracle check verifies.
LANG_MARKERS = {
    "en": ["the", "a", "and"],
    "query": ["query", "filter", "join"],
    "data": ["data", "table", "column"],
}


_STOP_ARR_SQL = "array(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"


def with_token_stats(df: DataFrame) -> DataFrame:
    """Token count, stopword ratio, mean word length.

    Script-aware (functions/tokenize.py): CJK chars count as individual
    tokens, so a no-space-script document gets a real token count
    instead of 1. Empty/whitespace-only text has 0 tokens; the ratio
    divisions are guarded (ANSI mode would otherwise throw on /0).

    Single-pass: count, stopword count, and summed length come out of
    ONE struct over ONE tokenizer evaluation — three independent column
    expressions would re-tokenize the text three times (measured 2x
    slower at sf0.1; higher-order functions sit outside codegen's
    common-subexpression elimination). The struct lands in its own
    projection so CollapseProject's cost check keeps it materialized
    once rather than inlining it into each consumer."""
    ts = F.expr(
        f"element_at(transform(array({tokens_sql()}), tk -> named_struct("
        "  'n', size(tk), "
        f" 'ns', size(filter(tk, w -> array_contains({_STOP_ARR_SQL}, "
        "                                            lower(w)))), "
        "  'sl', aggregate(tk, 0, (a, w) -> a + length(w)))), 1)")
    n_safe = F.greatest(F.col("_ts.n"), F.lit(1)).cast("double")
    return (df.withColumn("_ts", ts)
            .select("*",
                    F.col("_ts.n").alias("n_tokens"),
                    F.round(F.col("_ts.ns") / n_safe, 6)
                    .alias("stopword_ratio"),
                    F.round(F.col("_ts.sl").cast("double") / n_safe, 6)
                    .alias("mean_word_len"))
            .drop("_ts"))


def with_quality_score(df: DataFrame) -> DataFrame:
    """Deterministic quality score in [0,1]: length band + stopword band.

    A document scores high when it is neither trivially short nor
    pathologically long and has a natural-language stopword rate —
    the standard cheap pretraining-quality gate.
    """
    df = with_token_stats(df)
    len_score = (
        F.when(F.col("n_tokens") < 10, F.col("n_tokens") / 10.0)
        .when(F.col("n_tokens") > 1000, F.lit(0.5))
        .otherwise(F.lit(1.0))
    )
    stop_score = (
        F.when(F.col("stopword_ratio").between(0.05, 0.6), F.lit(1.0))
        .otherwise(F.lit(0.5))
    )
    return df.withColumn(
        "quality_score", F.round(len_score * 0.6 + stop_score * 0.4, 6))


def _entropy_sql(arr_sql: str) -> str:
    """Spark SQL text: Shannon entropy (bits) of the multiset in
    ``arr_sql`` (an array<string> expression), via run-lengths over the
    sorted array — O(n log n) per row, entirely map-side, whole-stage
    codegen, zero exchanges.

    Engine-parity notes (the DuckDB twin lives in __spark_entry__):
      * run GROUPING only needs equality, but run ORDER fixes the
        floating-point summation order — array_sort (Spark) and
        list_sort (DuckDB) both compare strings by binary UTF-8, so
        both engines fold the identical term sequence; log2 may differ
        by an ulp between Java and libm, absorbed by the consumers'
        round(…, 6) (same discipline as unigram_logprob's ln).
      * terms accumulate as ``a - p*log2(p)``: an all-one-run array
        sums to +0.0, never IEEE -0.0 (which would break the driver's
        bit-level value hash against an engine emitting +0.0).
      * the i=1 boundary rides a CASE, not a bare OR — element_at(xs, 0)
        raises under ANSI mode and Or's short-circuit is not a
        guaranteed error barrier.
      * empty arrays short-circuit to 0.0 before any sequence() call:
        Spark's sequence(1, 0) is a DESCENDING [1, 0], not empty."""
    return (
        f"element_at(transform(array(array_sort({arr_sql})), xs -> "
        "CASE WHEN size(xs) = 0 THEN cast(0.0 as double) ELSE "
        "element_at(transform(array(filter(sequence(1, size(xs)), i -> "
        "    CASE WHEN i = 1 THEN true "
        "         ELSE element_at(xs, i) != element_at(xs, i - 1) END)), "
        "  st -> aggregate(sequence(1, size(st)), cast(0.0 as double), "
        "    (a, j) -> a - ((CASE WHEN j < size(st) "
        "                         THEN element_at(st, j + 1) "
        "                         ELSE size(xs) + 1 END) - element_at(st, j))"
        "             / cast(size(xs) as double) "
        "             * log2(((CASE WHEN j < size(st) "
        "                          THEN element_at(st, j + 1) "
        "                          ELSE size(xs) + 1 END) - element_at(st, j))"
        "                    / cast(size(xs) as double)))), 1) END), 1)"
    )


# Every non-whitespace character — the char-entropy alphabet.
CHAR_PATTERN = f"[^{WS_RANGES}]"


def with_diversity_stats(df: DataFrame) -> DataFrame:
    """Per-document lexical/character diversity: the gate-battery
    signals that catch what token COUNTS cannot.

      * n_types / ttr — distinct tokens and type-token ratio: repeated-
        word spam scores near 0 while natural text sits ~0.4-0.9;
      * token_entropy — Shannon entropy (bits) of the token multiset:
        like ttr but weighs the skew, so "spam spam spam ham" and a
        4-word natural sentence separate;
      * char_entropy — entropy of the non-whitespace character multiset:
        the classic compression-ratio proxy that catches NON-LINGUISTIC
        noise tokens miss entirely — a base64/hex blob is ONE high-
        "quality" token to every token-level gate but shows ~4.5-6 bits
        of character entropy with zero token entropy, and single-char
        runs ("aaaa…") pin both to 0.

    Single-pass discipline: n, n_types, and token entropy come out of
    ONE struct over ONE tokenizer evaluation; char entropy is a second
    regexp scan of the raw text. Everything is map-side HOF expressions
    (no exchange, no Python) and deterministic — DuckDB computes the
    identical rounded values (oracle row diversity_stats)."""
    toks = tokens_sql()
    ds = F.expr(
        f"element_at(transform(array({toks}), tk -> named_struct("
        "  'n', size(tk), "
        "  'nt', size(array_distinct(tk)), "
        f" 'te', {_entropy_sql('tk')})), 1)")
    char_arr = f"regexp_extract_all(text, '{_sql_quote(CHAR_PATTERN)}', 0)"
    return (df.withColumn("_ds", ds)
            .select("*",
                    F.col("_ds.nt").cast("long").alias("n_types"),
                    F.round(F.col("_ds.nt")
                            / F.greatest(F.col("_ds.n"), F.lit(1)), 6)
                    .alias("ttr"),
                    F.round(F.col("_ds.te"), 6).alias("token_entropy"),
                    F.round(F.expr(_entropy_sql(char_arr)), 6)
                    .alias("char_entropy"))
            .drop("_ds"))


def with_lang_guess(df: DataFrame) -> DataFrame:
    """Marker-word language-ID: highest marker hit-count wins; ties break
    by marker order (en < query < data); no hits -> 'unknown'.

    All marker counts come out of ONE struct over ONE tokenizer
    evaluation (same single-pass discipline as with_token_stats)."""
    fields = ", ".join(
        f"'h_{name}', size(filter(tk, w -> array_contains(array("
        + ", ".join(f"'{m}'" for m in markers)
        + "), lower(w))))"
        for name, markers in LANG_MARKERS.items())
    hits = F.expr(
        f"element_at(transform(array({tokens_sql()}), "
        f"tk -> named_struct({fields})), 1)")
    df = df.withColumn("_lh", hits).select(
        "*", *[F.col(f"_lh.h_{name}").alias(f"hits_{name}")
               for name in LANG_MARKERS]).drop("_lh")
    names = list(LANG_MARKERS)
    best = F.lit("unknown")
    best_hits = F.lit(0)
    for name in names:
        h = F.col(f"hits_{name}")
        better = h > best_hits
        best = F.when(better, F.lit(name)).otherwise(best)
        best_hits = F.when(better, h).otherwise(best_hits)
    return df.withColumn("lang_guess", best).drop(
        *[f"hits_{n}" for n in names])


def with_fingerprint(df: DataFrame, k: int = 20) -> DataFrame:
    """Document fingerprints:
    - content_hash: md5 of the exact text (exact-dup key)
    - min_shingle: lexicographic min of md5 over all k-char shingles —
      a 1-element winnowing sketch; near-identical docs collide."""
    # dynamic-start substring needs the SQL expr form
    shingles = F.expr(
        f"transform(sequence(1, greatest(length(text) - {k - 1}, 1)), "
        f"i -> md5(substring(text, i, {k})))"
    )
    return df.withColumns({
        "content_hash": F.md5("text"),
        "min_shingle": F.array_min(shingles),
    })


def with_token_estimate(df: DataFrame) -> DataFrame:
    """BPE-ish token-count estimate for training-budget accounting.

    No tokenizer library ships in this environment, so the estimate
    mirrors how byte-pair pre-tokenizers segment text (the GPT-2-family
    pattern: letter runs, digit runs, punctuation as separate tokens),
    extended with a per-script CJK term:

      * each ALPHABETIC run (Latin incl. accents, Greek, Cyrillic,
        Hebrew, Arabic, Devanagari — tokenize.ALPHA_RANGES) contributes
        ceil(len/4) tokens — BPE merges average ~4 chars/token on
        alphabetic text, and a 15-char word is several tokens, not one;
      * each DIGIT run contributes ceil(len/3) — modern vocabs chunk
        digits in groups of <= 3;
      * each CJK character is 1 token — BPE vocabs average ~1-1.5
        chars/token on CJK; 1/char is the conservative budget bound;
      * every other non-space char (punctuation/symbol) is 1 token.

    Pure JVM regexp/HOF expressions — the corpus streams once, no
    Python — and deterministic, so DuckDB computes the identical number
    (oracle row token_budget)."""
    alpha = ALPHA_RANGES.replace("\\", "\\\\")
    cjk = CJK_RANGES.replace("\\", "\\\\")
    ws = WS_RANGES.replace("\\", "\\\\")
    letters = F.expr(
        f"aggregate(regexp_extract_all(text, '[{alpha}]+', 0), 0, "
        "(acc, w) -> acc + cast(ceil(length(w) / 4.0) as int))")
    digits = F.expr(
        "aggregate(regexp_extract_all(text, '[0-9]+', 0), 0, "
        "(acc, d) -> acc + cast(ceil(length(d) / 3.0) as int))")
    cjk_chars = F.expr(f"size(regexp_extract_all(text, '[{cjk}]', 0))")
    punct = F.expr(
        f"size(regexp_extract_all(text, '[^{alpha}0-9{ws}{cjk}]', 0))")
    return df.withColumn(
        "token_estimate",
        (letters + digits + cjk_chars + punct).cast("long"))


def token_budget(df: DataFrame) -> DataFrame:
    """Per-(lang, source) training-token budget rollup: document count,
    total/mean estimated tokens, and each group's share of the corpus
    budget. The groupBy keys are low-cardinality, so the aggregation is
    one partial-agg shuffle; the corpus total joins back as a broadcast
    of the 1-row aggregate (never a driver scalar)."""
    est = with_token_estimate(df)
    per = est.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("token_estimate").alias("total_tokens"),
        F.round(F.avg("token_estimate"), 6).alias("avg_tokens"))
    corpus = per.select(
        F.sum("total_tokens").cast("double").alias("corpus_tokens"))
    return (per.crossJoin(F.broadcast(corpus))
            .withColumn("budget_share",
                        F.round(F.col("total_tokens")
                                / F.col("corpus_tokens"), 6))
            .drop("corpus_tokens")
            .orderBy("lang", "source"))


def doc_words(df, extra_cols=None):
    """One row per (doc_id, lowercased token); empty tokens dropped.
    THE shared word-normalization for every corpus-model score
    (tfidf doc freqs, the unigram LM, the NB classifier) — one
    definition so the scores stay comparable feature-for-feature."""
    extra = [F.col(c) for c in (extra_cols or [])]
    return (df.select("doc_id", *extra,
                      F.explode(tokens_col()).alias("word"))
            .where(F.col("word") != "")
            .select("doc_id", *extra, F.lower("word").alias("word")))


def tfidf_top_terms(df: DataFrame, k: int = 20) -> DataFrame:
    """Corpus-level TF-IDF term ranking: per word, document frequency,
    total term frequency, idf = ln((N+1)/(df+1)), ranked by summed
    tf·idf. Top-k, ties broken by word.

    All-relational: explode -> two aggregations -> broadcast the 1-row
    corpus count (never a driver-side .count() scalar — the plan stays
    lazy and whole). The word->agg shuffle is the only data movement;
    at 10^12 docs the groupBy(word) benefits from partial map-side
    aggregation (word cardinality << row count)."""
    words = doc_words(df)
    n_docs = df.select(
        F.count("*").cast("double").alias("n_docs"))   # 1 row, broadcast
    stats = words.groupBy("word").agg(
        F.countDistinct("doc_id").alias("doc_freq"),
        F.count("*").alias("total_tf"))
    scored = stats.crossJoin(F.broadcast(n_docs)).select(
        "word", "doc_freq", "total_tf",
        F.round(F.log((F.col("n_docs") + 1) / (F.col("doc_freq") + 1)), 6)
        .alias("idf"),
        F.round(F.col("total_tf")
                * F.log((F.col("n_docs") + 1) / (F.col("doc_freq") + 1)), 6)
        .alias("tfidf"))
    return (scored.orderBy(F.desc("tfidf"), F.asc("word")).limit(k))


def repetition_stats(df: DataFrame) -> DataFrame:
    """Per-document Gopher-style repetition statistics (Rae et al. 2021,
    "Scaling Language Models", Table A1 — the standard pretraining
    repetition filters):

      * dup_line_frac     — fraction of (non-empty, trimmed) lines that
                            are occurrences of a line appearing more than
                            once in the document
      * top_bigram_frac   — fraction of tokens covered by the document's
                            most frequent word bigram (count*2 / n_tokens)
      * symbol_word_ratio — non-alphanumeric symbol count / token count

    Scale shape: the per-line and per-bigram counts are RELATIONAL
    (explode -> groupBy(doc_id, item) -> groupBy(doc_id)), not per-row
    HOF loops — a 10 MB pathological document costs O(items) across the
    cluster instead of O(items * distinct) inside one task, and both
    shuffles get map-side partial aggregation. Joins back to the doc
    table are on doc_id only. The plan reads the (doc_id, text)
    projection THREE times (base / lines / bigrams branches); at corpus
    scale either pre-materialize that 2-column projection or persist()
    the input — the alternative (one pass with per-doc distinct-count
    HOFs) trades bounded re-scan IO for unbounded per-task compute on
    adversarial documents, the wrong trade at 100 TB."""
    alpha = ALPHA_RANGES.replace("\\", "\\\\")
    cjk = CJK_RANGES.replace("\\", "\\\\")
    ws = WS_RANGES.replace("\\", "\\\\")
    base = df.select(
        "doc_id",
        F.size(tokens_col()).alias("n_tokens"),
        # symbols = not alphabetic, not digit, not space, not CJK — a
        # CJK char is a word-token, not a symbol.
        F.expr(f"size(regexp_extract_all(text, '[^{alpha}0-9{ws}{cjk}]', 0))")
        .alias("n_symbols"),
    )
    lines = (df.select("doc_id",
                       F.explode(F.split("text", "\n")).alias("line"))
             .select("doc_id", ws_trim(F.col("line")).alias("line"))
             .where(F.col("line") != ""))
    line_stats = (lines.groupBy("doc_id", "line")
                  .agg(F.count("*").alias("c"))
                  .groupBy("doc_id")
                  .agg(F.sum("c").alias("n_lines"),
                       F.sum(F.when(F.col("c") > 1, F.col("c"))
                             .otherwise(F.lit(0))).alias("dup_lines")))
    # Single-evaluation idiom (see dedup._word_shingles_sql): the token
    # array materializes once per row inside array()+transform — naming
    # the tokenizer directly in the per-bigram lambda would re-tokenize
    # the text once per bigram (O(len^2) on pathological long docs).
    bigram_arr = F.expr(
        f"element_at(transform(array({tokens_sql()}), t -> "
        "  transform(sequence(1, greatest(size(t) - 1, 1)), "
        "            i -> array_join(slice(t, i, 2), ' '))), 1)")
    bigrams = df.select("doc_id", F.explode(bigram_arr).alias("bigram"))
    bigram_stats = (bigrams.groupBy("doc_id", "bigram")
                    .agg(F.count("*").alias("c"))
                    .groupBy("doc_id")
                    .agg(F.max("c").alias("top_bigram_count")))
    return (base
            .join(line_stats, "doc_id", "left")
            .join(bigram_stats, "doc_id", "left")
            .select(
                "doc_id",
                F.col("n_tokens").cast("long").alias("n_tokens"),
                F.round(F.coalesce(F.col("dup_lines"), F.lit(0))
                        / F.coalesce(F.col("n_lines"), F.lit(1)), 6)
                .alias("dup_line_frac"),
                F.round(F.when(F.col("n_tokens") >= 2,
                               F.col("top_bigram_count") * 2.0
                               / F.col("n_tokens"))
                        .otherwise(F.lit(0.0)), 6)
                .alias("top_bigram_frac"),
                F.round(F.col("n_symbols")
                        / F.greatest(F.col("n_tokens"), F.lit(1)), 6)
                .alias("symbol_word_ratio"),
            ))


GOPHER_TOP_NGRAM_MAX = {2: 0.20, 3: 0.18, 4: 0.16}
GOPHER_DUP_NGRAM_MAX = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12,
                        9: 0.11, 10: 0.10}


def ngram_repetition(df: DataFrame,
                     ns_top: tuple = (2, 3, 4),
                     ns_dup: tuple = (5, 6, 7, 8, 9, 10)) -> DataFrame:
    """The rest of Gopher's Table A1 repetition family (Rae et al.
    2021): per document,

      * top{n}_char_frac — characters covered by the single most
        frequent word n-gram (count x n-gram chars / doc token chars;
        0 unless it occurs at least twice), n in ns_top; Gopher
        rejects above 0.20 / 0.18 / 0.16;
      * dup{n}_char_frac — fraction of n-gram-occurrence characters
        that belong to an n-gram appearing more than once, n in
        ns_dup; Gopher rejects above 0.15 ... 0.10.

    plus ``rep_keep``: the conjunction at the published thresholds.
    (dup_line_frac / top_bigram_frac live in repetition_stats; this
    operator adds the n>=2 character-weighted rules.) The dup
    denominator is occurrence characters (every n-gram occurrence's
    chars), which bounds the frac at 1 without the overlap-dedup pass
    some implementations run — deviation documented, thresholds keep
    their published values. Tie-break on the top n-gram needs no rule:
    candidates tying on (count, chars) have equal count*chars, so the
    output is tie-invariant.

    Scale shape: ALL requested n values ride ONE token-array
    evaluation into ONE explode (each doc emits ~|ns| x n_tokens
    tagged windows), then the same two relational shuffles as
    repetition_stats — groupBy(doc_id, n, gram) count with map-side
    partials, then groupBy(doc_id). Per-window work is O(n) slice +
    concat, bounded per task; no per-doc distinct-count HOFs, so an
    adversarial 10 MB doc costs O(windows) across the cluster. Docs
    with zero tokens emit no windows and no row (the word-count gate
    rejects them first); a doc shorter than some n simply lacks that
    n's row and the frac coalesces to 0."""
    ns = sorted(set(ns_top) | set(ns_dup))
    # No token contains whitespace (the tokenizer splits on it), so an
    # n-gram's token chars are length(gram) - (n-1) joiner spaces —
    # derived AFTER the count agg instead of an O(n) aggregate per
    # window, and the explode shuffles one string per window, nothing
    # else (measured 9.2 -> 7.8 s at sf0.1 for the 9-value default;
    # the remaining cost is the inherent |ns| x n_tokens window blowup
    # — production picks the n values it actually gates on).
    parts = []
    for n in ns:
        parts.append(
            "transform(filter(transform(tk, (w, i) -> i), "
            f"                i -> i + {n} <= size(tk)), "
            f"i -> named_struct('n', {n}, "
            f"     'g', concat_ws(' ', slice(tk, i + 1, {n}))))")
    grams_expr = F.expr(
        f"element_at(transform(array({tokens_sql()}), tk -> named_struct("
        "  'tc', aggregate(tk, 0, (a, w) -> a + length(w)), "
        f" 'gs', concat({', '.join(parts)}))), 1)")
    ex = (df.withColumn("_ng", grams_expr)
          .select("doc_id", F.col("_ng.tc").alias("tc"),
                  F.explode("_ng.gs").alias("s"))
          .select("doc_id", "tc", "s.n", "s.g"))
    cnt = (ex.groupBy("doc_id", "tc", "n", "g")
           .agg(F.count("*").alias("c"))
           .withColumn("ch", F.length("g") - (F.col("n") - 1)))
    per_n = (cnt.groupBy("doc_id", "tc", "n").agg(
        F.sum(F.col("c") * F.col("ch")).alias("occ"),
        F.sum(F.when(F.col("c") >= 2, F.col("c") * F.col("ch"))
              .otherwise(F.lit(0))).alias("dup"),
        F.max(F.struct("c", "ch")).alias("top")))
    # A count-1 "top" n-gram is not repetition: without the c >= 2
    # guard every short unique-word doc scores chars(one n-gram)/tc
    # and trips the threshold. Overlapping repeats can still push the
    # frac past 1 (e.g. "spam ham" * k) — Gopher's definition, kept.
    top_cols = [
        F.round(F.coalesce(
            F.max(F.when((F.col("n") == n) & (F.col("top.c") >= 2),
                         F.col("top.c") * F.col("top.ch")
                         / F.col("tc"))), F.lit(0.0)), 6)
        .alias(f"top{n}_char_frac") for n in sorted(ns_top)]
    dup_cols = [
        F.round(F.coalesce(
            F.max(F.when(F.col("n") == n, F.col("dup") / F.col("occ"))),
            F.lit(0.0)), 6)
        .alias(f"dup{n}_char_frac") for n in sorted(ns_dup)]
    out = per_n.groupBy("doc_id").agg(*top_cols, *dup_cols)
    keep = F.lit(True)
    for n in sorted(ns_top):
        keep = keep & (F.col(f"top{n}_char_frac")
                       <= GOPHER_TOP_NGRAM_MAX[n])
    for n in sorted(ns_dup):
        keep = keep & (F.col(f"dup{n}_char_frac")
                       <= GOPHER_DUP_NGRAM_MAX[n])
    return out.withColumn("rep_keep", keep)


def with_unigram_logprob(df: DataFrame) -> DataFrame:
    """Unigram language-model score per document: mean over tokens of
    ln P(word), with P estimated from THIS corpus (add-one smoothing
    over the observed vocabulary). The cheap perplexity-proxy quality
    filter — word-salad and boilerplate docs score far below natural
    text because they over-use rare tokens.

    Scale shape: one explode -> groupBy(word) frequency table (partial
    map-side agg; vocab cardinality << token count), joined back to the
    exploded tokens on the word key (NOT broadcast — at web scale the
    vocabulary is 10^8+ rows), then one groupBy(doc_id) mean. Corpus
    totals ride along as a broadcast 1-row aggregate, never a driver
    scalar."""
    words = doc_words(df)
    freqs = words.groupBy("word").agg(F.count("*").alias("wc"))
    totals = freqs.agg(
        F.sum("wc").cast("double").alias("n_tokens_corpus"),
        F.count("*").cast("double").alias("vocab"))
    scored = (words.join(freqs, "word")
              .crossJoin(F.broadcast(totals))
              .withColumn("lp", F.log((F.col("wc") + 1)
                                      / (F.col("n_tokens_corpus")
                                         + F.col("vocab")))))
    return (scored.groupBy("doc_id")
            .agg(F.round(F.avg("lp"), 6).alias("unigram_logprob"),
                 F.count("*").alias("n_scored_tokens")))
