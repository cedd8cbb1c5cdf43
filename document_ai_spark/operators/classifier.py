"""Model-based quality / domain classification — the CCNet-style
"train a cheap classifier on a reference corpus, score every crawl
document" step (fastText's role in CCNet/RefinedWeb), re-expressed as
pure relational DataFrame ops.

Multinomial Naive Bayes over the shared script-aware tokenizer
(functions/tokenize.py): training is one explode -> groupBy(word)
count with per-class conditional sums, the model is a (word, delta)
table with add-one smoothing over the union vocabulary, and scoring is
one join + one groupBy(doc_id). No driver-side training loop, no
Python in the hot path, and every step has an exact DuckDB mirror
(registry row `nb_quality`).

Scale shape (the part that matters at 10^12 docs):
- Training counts are groupBy(word) with map-side partial aggregation —
  the shuffle carries vocab-cardinality rows, not token-cardinality.
- Corpus totals and the prior are 1-row aggregates broadcast into the
  plan, never driver scalars.
- Scoring joins exploded tokens to the model on the word key. The model
  is NOT broadcast by default: at web scale the vocabulary is 10^8+
  rows (same sizing note as textquality.with_unigram_logprob). The
  word-key join clusters rows BY WORD, so the per-doc sum's map-side
  partials emit up to one row per (doc, partition) — not ~1 per doc;
  the post-score shuffle is bounded by docs x shuffle-partitions, the
  same shape with_unigram_logprob pays and the price of not
  broadcasting a 10^8-row model.
- Unseen-at-train-time words score the smoothed default
  ln((n_neg+V)/(n_pos+V)) via a left join + coalesce — the operator is
  honest when the model is trained on a reference slice and applied to
  a disjoint crawl, which is the production use.
- The single-expression nb_quality plan re-derives the count table for
  the model, the totals, and the default (Catalyst does not dedupe
  common aggregate subtrees — same documented trade as
  with_unigram_logprob's freqs). The production path avoids it
  structurally: nb_train once, write model+params to parquet, nb_score
  forever — which is why train and score are separate functions.

Determinism / oracle parity: token deltas are pure ln() expressions both
engines evaluate identically (libm); the per-doc sum is rounded to 4
decimals before the sign test so `nb_pred` cannot flip on last-ulp
summation-order differences (sum magnitude <= ~10^4, double error
~1e-10 — four decimals is far outside the noise).

Reference parity note: the reference (Ayushman1123/Document-ai-) has no
model-based corpus filter; this extends the curation family the same
way its confidence gating (backend field_extractor.py) gates extraction
outputs — a scored keep/drop signal per document.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.tokenize import tokens_col

__all__ = ["nb_train", "nb_score", "nb_quality"]


def _doc_words(docs: DataFrame, extra_cols: list[str] | None = None
               ) -> DataFrame:
    """THE shared word normalization (textquality.doc_words) — one
    definition keeps the NB features comparable with the unigram-LM
    and TF-IDF corpus scores, structurally rather than by comment."""
    from .textquality import doc_words
    return doc_words(docs, extra_cols)


def nb_train(labeled: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Train a two-class multinomial NB from `labeled(doc_id, text,
    label:boolean)`.

    NULL labels are EXCLUDED from training: a NULL predicate result
    (e.g. lang IS NULL under `lang == 'en'`) means "label unknown",
    and the when/otherwise counting would otherwise silently train
    every such doc as a confident NEGATIVE example — systematically
    mislabeled data on exactly the undetected-language crawl slice a
    quality classifier is pointed at (review finding).

    Returns (model, params):
    - model(word, delta): delta = ln P(w|pos) - ln P(w|neg) under
      add-one smoothing over the union vocabulary V —
      ln((c_pos+1)/(N_pos+V)) - ln((c_neg+1)/(N_neg+V)).
    - params: ONE row (prior_logodds, default_delta) where
      prior_logodds = ln((D_pos+1)/(D_neg+1)) over labeled docs and
      default_delta is the smoothed delta of a word neither class saw.
    """
    labeled = labeled.where(F.col("label").isNotNull())
    words = _doc_words(labeled, ["label"])
    counts = words.groupBy("word").agg(
        F.sum(F.when(F.col("label"), 1).otherwise(0)).alias("c_pos"),
        F.sum(F.when(F.col("label"), 0).otherwise(1)).alias("c_neg"))
    totals = counts.agg(
        F.sum("c_pos").cast("double").alias("n_pos"),
        F.sum("c_neg").cast("double").alias("n_neg"),
        F.count("*").cast("double").alias("vocab"))
    model = (counts.crossJoin(F.broadcast(totals))
             .select("word",
                     (F.log((F.col("c_pos") + 1)
                            / (F.col("n_pos") + F.col("vocab")))
                      - F.log((F.col("c_neg") + 1)
                              / (F.col("n_neg") + F.col("vocab"))))
                     .alias("delta")))
    params = (labeled.agg(
        F.sum(F.when(F.col("label"), 1).otherwise(0)).alias("d_pos"),
        F.sum(F.when(F.col("label"), 0).otherwise(1)).alias("d_neg"))
        .crossJoin(F.broadcast(totals))
        .select(
            F.log((F.col("d_pos") + 1).cast("double")
                  / (F.col("d_neg") + 1)).alias("prior_logodds"),
            (F.log(F.lit(1.0) / (F.col("n_pos") + F.col("vocab")))
             - F.log(F.lit(1.0) / (F.col("n_neg") + F.col("vocab"))))
            .alias("default_delta")))
    return model, params


def nb_score(docs: DataFrame, model: DataFrame, params: DataFrame
             ) -> DataFrame:
    """Score docs(doc_id, text) against a trained (model, params).

    Output: (doc_id, nb_logodds, nb_pred, n_scored_tokens) — one row
    per document that has at least one token (zero-token docs carry no
    evidence; same contract as with_unigram_logprob). nb_pred is the
    sign of the ROUNDED log-odds, so it is stable across engines."""
    words = _doc_words(docs)
    scored = (words.join(model, "word", "left")
              .crossJoin(F.broadcast(params)))
    per_doc = scored.groupBy("doc_id").agg(
        F.sum(F.coalesce(F.col("delta"), F.col("default_delta")))
        .alias("_s"),
        F.max("prior_logodds").alias("_p"),
        F.count("*").alias("n_scored_tokens"))
    logodds = F.round(F.col("_s") + F.col("_p"), 4)
    return per_doc.select(
        "doc_id",
        logodds.alias("nb_logodds"),
        (logodds > 0).alias("nb_pred"),
        "n_scored_tokens")


def nb_quality(docs: DataFrame, positive: Column) -> DataFrame:
    """Self-trained corpus classifier: label each doc with `positive`
    (e.g. F.col("lang") == "en" — "does this look like the target
    slice"), train NB on the whole corpus, score every doc.

    The production variant trains on a held-out reference corpus and
    scores a disjoint crawl — nb_train/nb_score compose that directly;
    this wrapper is the self-contained form the oracle can mirror on
    one table."""
    labeled = docs.withColumn("label", positive)
    model, params = nb_train(labeled)
    return nb_score(docs, model, params)
