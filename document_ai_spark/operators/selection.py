"""Published-heuristic data-selection operators: the Gopher rule set,
CCNet-style perplexity buckets, and DSIR hashed-n-gram importance
weights.

These are the three standard "which documents do we train on" passes a
pretraining pipeline runs after dedup/decontamination (all from public
papers — Rae et al. 2021 "Scaling Language Models" App. A; Wenzek et
al. 2020 "CCNet"; Xie et al. 2023 "Data Selection for Language Models
via Importance Resampling"). Everything is built-in Catalyst
expressions over the shared script-aware tokenizer
(functions/tokenize.py) — no Python in the hot path — and every
operator has a DuckDB oracle in __spark_entry__.py.

Scale shapes:
  * gopher_rules — ONE corpus scan; all token and line statistics come
    out of two structs over one tokenizer eval / one line split (the
    with_token_stats single-eval discipline); pure map, no exchange.
  * perplexity_buckets — the unigram-LM pipeline (one explode + two
    word-key hash aggs) plus a lang-cardinality threshold table that
    broadcasts; the corpus never sorts. Exact `percentile` buffers a
    slice's logprobs inside one agg buffer (one row per DOC, not per
    token); at 100 TB swap to approx_percentile with a documented
    tolerance — the operator takes the thresholds from an argument so
    deployments can precompute them.
  * dsir_logweights / dsir_sample — one explode of hashed features,
    one hash agg keyed on the BOUNDED bucket id (n_buckets rows, map-
    side partials collapse the long tail), then the bucket->log-ratio
    table (n_buckets rows) broadcasts back onto the feature stream and
    one per-doc sum. The corpus shuffles only (doc_id, bucket) pairs;
    no stage is wider than the tokenized text itself. dsir_sample's
    Gumbel top-k is an orderBy(limit k) = TakeOrdered, never a full
    sort.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.tokenize import ALPHA_RANGES, tokens_sql, ws_trim_sql
from .textquality import with_unigram_logprob

# Gopher App. A required stop words: a document must contain >= 2.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have",
                    "with"]
_GOPHER_STOP_SQL = ("array(" + ", ".join(f"'{w}'" for w in
                                         GOPHER_STOPWORDS) + ")")

# Thirds, spelled as the SAME repr-literal in the Spark expression and
# the DuckDB oracle so both engines parse the identical double.
_P_LO = repr(1.0 / 3.0)
_P_HI = repr(2.0 / 3.0)


def gopher_rules(docs: DataFrame,
                 min_words: int = 50, max_words: int = 100_000,
                 min_mwl: float = 3.0, max_mwl: float = 10.0,
                 max_symbol_ratio: float = 0.1,
                 max_bullet_frac: float = 0.9,
                 max_ellipsis_frac: float = 0.3,
                 min_alpha_frac: float = 0.8,
                 min_stop_hits: int = 2) -> DataFrame:
    """Per-document Gopher quality-rule flags (Rae et al. 2021 App. A):

      * word count in [min_words, max_words]
      * mean word length in [min_mwl, max_mwl]
      * symbol-to-word ratio ('#' chars + '...' occurrences) <= 0.1
      * <= 90% of lines start with a bullet ('-', '*', U+2022)
      * <= 30% of lines end with an ellipsis ('...' or U+2026)
      * >= 80% of words contain an alphabetic character
      * >= 2 distinct required stop words present

    Emits each raw metric, one boolean per rule, and the conjunction
    ``gopher_keep``. Substring counts use non-overlapping replace()
    arithmetic (no regex), which both engines evaluate identically;
    the line regexes use only literal classes both Java regex and RE2
    read the same way.

    Single corpus scan: token stats ride ONE struct over ONE tokenizer
    evaluation, line stats ONE struct over ONE split — the
    with_token_stats projection-boundary discipline, so nothing
    re-tokenizes per consumer."""
    alpha = ALPHA_RANGES.replace("\\", "\\\\")
    tok_struct = F.expr(
        f"element_at(transform(array({tokens_sql()}), tk -> named_struct("
        "  'n', size(tk), "
        "  'sl', aggregate(tk, 0, (a, w) -> a + length(w)), "
        f" 'na', size(filter(tk, w -> w rlike '[{alpha}]')), "
        "  'nstop', size(array_intersect(transform(tk, w -> lower(w)), "
        f"                               {_GOPHER_STOP_SQL})))), 1)")
    line_struct = F.expr(
        "element_at(transform(array(split(text, '\\n')), ls -> "
        "named_struct("
        "  'nl', size(ls), "
        "  'nb', size(filter(ls, l -> "
        f"             {ws_trim_sql('l')} rlike '^[-*\\\\x{{2022}}]')), "
        "  'ne', size(filter(ls, l -> "
        "             l rlike '(\\\\.\\\\.\\\\.|\\\\x{2026}) *$')))), 1)")
    n_hash = F.length("text") - F.length(F.replace(F.col("text"),
                                                   F.lit("#"), F.lit("")))
    n_ell = ((F.length("text")
              - F.length(F.replace(F.col("text"), F.lit("..."),
                                   F.lit("")))) / 3).cast("long")
    staged = (docs
              .withColumn("_tk", tok_struct)
              .withColumn("_ln", line_struct)
              .withColumn("_nsym", n_hash + n_ell))
    n_safe = F.greatest(F.col("_tk.n"), F.lit(1)).cast("double")
    nl_safe = F.greatest(F.col("_ln.nl"), F.lit(1)).cast("double")
    m = (staged.select(
        "doc_id",
        F.col("_tk.n").cast("long").alias("n_words"),
        F.round(F.col("_tk.sl") / n_safe, 6).alias("mean_word_len"),
        F.round(F.col("_nsym") / n_safe, 6).alias("symbol_ratio"),
        F.round(F.col("_ln.nb") / nl_safe, 6).alias("bullet_frac"),
        F.round(F.col("_ln.ne") / nl_safe, 6).alias("ellipsis_frac"),
        F.round(F.col("_tk.na") / n_safe, 6).alias("alpha_frac"),
        F.col("_tk.nstop").cast("long").alias("stop_hits")))
    flags = {
        "ok_words": F.col("n_words").between(min_words, max_words),
        "ok_mwl": F.col("mean_word_len").between(min_mwl, max_mwl),
        "ok_symbols": F.col("symbol_ratio") <= max_symbol_ratio,
        "ok_bullets": F.col("bullet_frac") <= max_bullet_frac,
        "ok_ellipsis": F.col("ellipsis_frac") <= max_ellipsis_frac,
        "ok_alpha": F.col("alpha_frac") >= min_alpha_frac,
        "ok_stops": F.col("stop_hits") >= min_stop_hits,
    }
    out = m
    keep = F.lit(True)
    for name, cond in flags.items():
        out = out.withColumn(name, cond)
        keep = keep & cond
    return out.withColumn("gopher_keep", keep)


def perplexity_buckets(docs: DataFrame,
                       thresholds: DataFrame | None = None) -> DataFrame:
    """CCNet-style head/middle/tail buckets: per language, split the
    corpus into thirds by unigram-LM score (the perplexity proxy —
    higher logprob = more natural text = 'head'). CCNet (Wenzek et al.
    2020) trains on head+middle and drops tail; the bucket label is the
    standard curriculum/mixing knob.

    Thresholds are the exact per-lang 1/3 and 2/3 quantiles
    (slice_logprob_floors' percentile/quantile_cont parity idiom,
    rounded to 4 decimals on both engines). Pass a precomputed
    ``thresholds(lang, t_mid, t_head)`` frame to pin them (the 100 TB
    deployment computes them once on a sample); by default they come
    from the corpus itself. Zero-token docs have no logprob and no row
    (inner join), matching CCNet's drop of empty pages."""
    lp = (with_unigram_logprob(docs)
          .select("doc_id", "unigram_logprob"))
    scored = docs.select("doc_id", "lang").join(lp, "doc_id")
    if thresholds is None:
        thresholds = (scored.groupBy("lang").agg(
            F.round(F.expr(
                f"percentile(unigram_logprob, {_P_LO})"), 4)
            .alias("t_mid"),
            F.round(F.expr(
                f"percentile(unigram_logprob, {_P_HI})"), 4)
            .alias("t_head")))
    return (scored.join(F.broadcast(thresholds), "lang")
            .select("doc_id", "lang", "unigram_logprob",
                    F.when(F.col("unigram_logprob") >= F.col("t_head"),
                           F.lit("head"))
                    .when(F.col("unigram_logprob") >= F.col("t_mid"),
                          F.lit("middle"))
                    .otherwise(F.lit("tail")).alias("ppl_bucket")))


def _feature_array_expr() -> str:
    """Spark SQL expr: lowercased word unigrams + space-joined bigrams
    of the script-aware token array, built inside ONE tokenizer
    evaluation (DSIR's hashed feature set, Xie et al. 2023 §3)."""
    return (
        f"element_at(transform(array({tokens_sql()}), tk0 -> "
        "concat(transform(tk0, w -> lower(w)), "
        "       transform(slice(tk0, 1, greatest(size(tk0) - 1, 0)), "
        "                 (w, i) -> concat(lower(w), ' ', "
        "                                  lower(element_at(tk0, i + 2)))"
        "                ))), 1)")


def _hashed_features(docs: DataFrame, target: Column,
                     n_buckets: int) -> DataFrame:
    """(doc_id, is_t, bucket): every unigram/bigram feature hashed into
    [0, n_buckets) via the 28-bit md5 prefix both engines compute
    bit-identically (the dedup.py MinHash recipe)."""
    return (docs
            .select("doc_id", target.alias("is_t"),
                    F.explode(F.expr(_feature_array_expr()))
                    .alias("feat"))
            .select("doc_id", "is_t",
                    (F.expr("cast(conv(substring(md5(feat), 1, 7), "
                            "16, 10) as bigint)")
                     % n_buckets).alias("bucket")))


def dsir_logweights(docs: DataFrame, target: Column | None = None,
                    n_buckets: int = 1024,
                    target_docs: DataFrame | None = None) -> DataFrame:
    """DSIR importance log-weights (Xie et al. 2023): score each raw
    document by how target-like its hashed-n-gram profile is,

        log w(x) = sum over features f of
                   [ ln p_target(bucket(f)) - ln p_raw(bucket(f)) ]

    with add-one-smoothed bucket distributions. Two published shapes:

      * in-corpus target (default): p_target from the rows of ``docs``
        where the ``target`` predicate holds (default lang = 'en'),
        p_raw from ALL rows;
      * reference corpus: pass ``target_docs`` (doc_id, text) — e.g.
        Wikipedia as the trusted domain — and p_target is estimated
        from it while p_raw stays the raw corpus (the paper's setup).
        The reference's bucket counts are one n_buckets-row aggregate,
        so an arbitrarily large reference costs one extra scan and no
        extra shuffle width.

    High-weight documents look like the target domain; selecting the
    top of the weight distribution (see dsir_sample) is the published
    alternative to binary classifier gating.

    Returns (doc_id, n_features, dsir_logw); the sum rounds to 4
    decimals so engine-dependent float summation order can't flip the
    hash compare. Zero-token docs have no features and no row."""
    if target_docs is not None:
        feats = _hashed_features(docs, F.lit(False), n_buckets)
        tcounts = (_hashed_features(target_docs, F.lit(True), n_buckets)
                   .groupBy("bucket").agg(F.count("*").alias("c_t")))
        rcounts = feats.groupBy("bucket").agg(F.count("*").alias("c_r"))
        # Full outer: a bucket seen only in the reference still shifts
        # the smoothed totals; a raw-only bucket gets c_t = 0.
        bc = (rcounts.join(tcounts, "bucket", "full_outer")
              .select("bucket",
                      F.coalesce("c_t", F.lit(0)).alias("c_t"),
                      F.coalesce("c_r", F.lit(0)).alias("c_r")))
    else:
        if target is None:
            target = F.col("lang") == "en"
        feats = _hashed_features(docs, target, n_buckets)
        bc = feats.groupBy("bucket").agg(
            F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("c_t"),
            F.count("*").alias("c_r"))
    tot = bc.agg(F.sum("c_t").cast("double").alias("t_tot"),
                 F.sum("c_r").cast("double").alias("r_tot"))
    ratio = (bc.crossJoin(F.broadcast(tot))
             .select("bucket",
                     (F.log((F.col("c_t") + 1)
                            / (F.col("t_tot") + n_buckets))
                      - F.log((F.col("c_r") + 1)
                              / (F.col("r_tot") + n_buckets)))
                     .alias("lr")))
    return (feats.join(F.broadcast(ratio), "bucket")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_features"),
                 F.round(F.sum("lr"), 4).alias("dsir_logw")))


def dsir_sample(docs: DataFrame, k: int, target: Column | None = None,
                n_buckets: int = 1024, seed: int = 0,
                target_docs: DataFrame | None = None) -> DataFrame:
    """DSIR's Gumbel-top-k importance resample: perturb each log-weight
    with an i.i.d. Gumbel(0,1) draw and keep the k largest — exactly
    sampling k documents without replacement with probability
    proportional to w(x) (the Gumbel-max trick the paper uses).

    The Gumbel draw is md5-seeded (u = (h+1)/(2^32+1) from the first 8
    hex chars of md5('<seed>:<doc_id>'), g = -ln(-ln(u))), so the
    sample is deterministic, reproducible across engines, and stable
    under repartitioning. Selection key rounds to 4 decimals with a
    doc_id tiebreak -> a total order both engines agree on; the top-k
    is an orderBy+limit (TakeOrdered), never a full sort."""
    w = dsir_logweights(docs, target=target, n_buckets=n_buckets,
                        target_docs=target_docs)
    u = ((F.expr(f"cast(conv(substring(md5(concat('{seed}', ':', "
                 "cast(doc_id as string))), 1, 8), 16, 10) as bigint)")
          + 1) / F.lit(float(2 ** 32 + 1)))
    key = F.round(F.col("dsir_logw") + (-F.log(-F.log(u))), 4)
    return (w.withColumn("gumbel_key", key)
            .orderBy(F.col("gumbel_key").desc(), "doc_id")
            .limit(k))
