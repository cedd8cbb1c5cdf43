"""End-to-end training-data curation: quality gate -> near-dup cluster
removal -> token budget.

The composition every pretraining-data pipeline runs before a training
job: drop low-quality documents, collapse each near-duplicate cluster to
one representative, then report how many training tokens survive per
(lang, source) slice. Built entirely from this repo's operators —
with_quality_score (textquality), banded_near_dup_pairs +
duplicate_clusters (dedup), token_budget (textquality) — so its scale
shape is theirs: one quality scan (JVM exprs), one banded-LSH candidate
shuffle with capped buckets, label propagation over the pair table only
(near-dup pairs are a tiny fraction of the corpus), an anti-join of the
corpus against the loser set, and a low-cardinality rollup. No stage
touches more than (doc_id, sketch)-sized rows after the first scan.

Oracle: the `curation_budget` row in __spark_entry__.py computes the
same pipeline in DuckDB (quality CASEs, LSH CTEs, a recursive-CTE
transitive closure, anti-join, budget rollup) — a green row checks the
whole composition end-to-end, not just the parts.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import banded_near_dup_pairs, duplicate_clusters
from .textquality import (
    repetition_stats,
    token_budget,
    with_quality_score,
    with_unigram_logprob,
)


def curate(docs: DataFrame, quality_min: float = 0.8,
           jaccard_min: float = 0.5) -> DataFrame:
    """docs(doc_id, text, lang, source) -> per-(lang, source) token
    budget of the quality-gated, near-dup-deduplicated corpus.

    Keep rule: a doc survives iff quality_score >= quality_min AND it is
    its near-dup cluster's representative (the cluster's min doc_id —
    deterministic, engine-independent). Singletons have no cluster row
    and survive by definition."""
    q = (with_quality_score(docs)
         .where(F.col("quality_score") >= quality_min)
         .select("doc_id", "text", "lang", "source"))
    pairs = banded_near_dup_pairs(q, jaccard_min=jaccard_min)
    losers = (duplicate_clusters(pairs)
              .where(F.col("doc_id") != F.col("cluster"))
              .select("doc_id"))
    kept = q.join(losers, "doc_id", "left_anti")
    return token_budget(kept)


def quality_gates(docs: DataFrame, quality_min: float = 0.8,
                  dup_line_max: float = 0.3, top_bigram_max: float = 0.2,
                  logprob_min: float = None) -> DataFrame:
    """Composite pretraining-quality gate: per doc, every gate signal
    plus the combined ``keep`` verdict.

      * quality_score >= quality_min      (length + stopword bands)
      * dup_line_frac <= dup_line_max     (boilerplate/chrome filter)
      * top_bigram_frac <= top_bigram_max (Gopher repetition filter)
      * unigram_logprob >= logprob_min    (word-salad filter; skipped
        when logprob_min is None — the threshold is corpus-relative,
        see CALIBRATION.md for the measured separation)

    Calibrated on the labeled micro-corpus (sources/labeled.py):
    quality_score ALONE does not reject word salad (salad scores exactly
    0.8 — length band 1.0, stopword band floor 0.5) or repetition bombs;
    the composite rule separates all four classes (CALIBRATION.md).

    Scale shape: three audited component scans (with_quality_score,
    repetition_stats, with_unigram_logprob) joined on doc_id only; no
    stage carries text past its own scan. Zero-token docs have no
    unigram row — the left join + coalesce(-inf) fails them closed."""
    q = with_quality_score(docs).select("doc_id", "quality_score")
    rep = repetition_stats(docs).select(
        "doc_id", "dup_line_frac", "top_bigram_frac")
    out = q.join(rep, "doc_id")
    keep = ((F.col("quality_score") >= quality_min)
            & (F.col("dup_line_frac") <= dup_line_max)
            & (F.col("top_bigram_frac") <= top_bigram_max))
    if logprob_min is not None:
        lp = with_unigram_logprob(docs).select("doc_id", "unigram_logprob")
        out = out.join(lp, "doc_id", "left")
        keep = keep & (F.coalesce("unigram_logprob", F.lit(-1e9))
                       >= logprob_min)
    return out.withColumn("keep", keep)


def eval_ngrams(eval_docs: DataFrame, n: int = 3) -> DataFrame:
    """Distinct word n-grams of an evaluation/benchmark set: the
    contamination blocklist. Eval sets are small (10^3-10^5 docs), so
    the result broadcasts."""
    from .dedup import _word_shingles
    return (eval_docs
            .select(F.explode(_word_shingles(n)).alias("ngram"))
            .distinct())


def contamination(docs: DataFrame, blocklist: DataFrame, n: int = 3
                  ) -> DataFrame:
    """Per-document benchmark-contamination hits: (doc_id, n_hits) for
    every doc sharing >= 1 word n-gram with the eval blocklist.

    The standard decontamination step before training (GPT-3 appendix C
    style, word-n-gram variant). Scale shape: the corpus streams ONCE —
    explode n-grams map-side, inner-join against the BROADCAST blocklist
    (no corpus shuffle on the join), then one groupBy(doc_id) with
    map-side partial counts. No stage carries more than
    (doc_id, ngram)-sized rows."""
    from .dedup import _word_shingles
    grams = docs.select("doc_id", F.explode(_word_shingles(n)).alias("ngram"))
    return (grams.join(F.broadcast(blocklist), "ngram")
            .groupBy("doc_id")
            .agg(F.count_distinct("ngram").alias("n_hits")))


def decontaminate(docs: DataFrame, eval_docs: DataFrame, n: int = 3
                  ) -> DataFrame:
    """Corpus minus every document contaminated by the eval set."""
    hits = contamination(docs, eval_ngrams(eval_docs, n), n)
    return docs.join(hits.select("doc_id"), "doc_id", "left_anti")


def deterministic_sample(docs: DataFrame, fraction: float = 0.25,
                         key: str = "doc_id") -> DataFrame:
    """Reproducible corpus sampling: keep a row iff the first two hex
    chars of md5(key) fall below floor(fraction * 256).

    Unlike df.sample(), the decision is a pure function of the row key —
    identical across runs, engines (DuckDB computes the same md5), and
    cluster layouts, which is what eval-set carving and A/B corpus
    splits need at 10^12 docs. Map-side only: no shuffle, no RNG state.

    Granularity is 1/256 (two hex chars): fraction rounds DOWN to
    floor(fraction * 256)/256, so any fraction < 1/256 keeps nothing.
    fraction >= 1.0 returns the input unchanged (the naive hex compare
    would break there: format(256,'02x') is the 3-char '100', and
    'ff' > '100' lexicographically keeps only ~1/16 of rows)."""
    if fraction <= 0:
        raise ValueError(f"fraction must be positive, got {fraction}")
    if fraction >= 1.0:
        return docs
    cut = format(int(fraction * 256), "02x")
    return docs.where(
        F.substring(F.md5(F.col(key).cast("string")), 1, 2) < F.lit(cut))
