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
from .textquality import token_budget, with_quality_score


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
