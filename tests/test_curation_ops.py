"""Unit tests for the curation-side ops: Gopher-style repetition stats
and benchmark decontamination (operators/textquality.py,
operators/curation.py)."""
from __future__ import annotations

from pyspark.sql import functions as F

from document_ai_spark.operators.curation import (
    contamination,
    decontaminate,
    eval_ngrams,
)
from document_ai_spark.operators.textquality import repetition_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats_known_values(spark):
    rows = [
        # 3 lines, "dup" line twice -> dup_line_frac = 2/3;
        # tokens: dup(x2) one two -> top bigram any count 1 over 4 tokens
        (1, "dup\ndup\none two"),
        # "a b a b a" -> bigrams: [a b, b a, a b, b a] -> top count 2 of
        # 5 tokens -> 0.8; single line, no dups
        (2, "a b a b a"),
        # symbols: 6 non-alnum chars over 2 tokens -> ratio 3.0
        (3, "$$ @@!!"),
    ]
    out = {r["doc_id"]: r.asDict()
           for r in repetition_stats(_docs(spark, rows)).collect()}
    assert abs(out[1]["dup_line_frac"] - 2 / 3) < 1e-6
    assert out[1]["top_bigram_frac"] == 0.5  # count 1 * 2 / 4 tokens
    assert out[2]["dup_line_frac"] == 0.0
    assert abs(out[2]["top_bigram_frac"] - 0.8) < 1e-6
    assert out[3]["symbol_word_ratio"] == 3.0  # 6 symbols / 2 tokens


def test_repetition_stats_degenerate_docs(spark):
    rows = [(1, ""), (2, "word"), (3, "   ")]
    out = {r["doc_id"]: r.asDict()
           for r in repetition_stats(_docs(spark, rows)).collect()}
    for d in (1, 2, 3):
        assert out[d]["dup_line_frac"] == 0.0
        assert out[d]["top_bigram_frac"] == 0.0  # < 2 tokens


def test_contamination_and_decontaminate(spark):
    evals = _docs(spark, [(100, "alpha beta gamma delta")])
    corpus = _docs(spark, [
        (1, "x alpha beta gamma y"),      # shares 3-gram "alpha beta gamma"
        (2, "beta gamma delta tail one"),  # shares "beta gamma delta"
        (3, "clean text with no overlap at all"),
        (4, "alpha beta x gamma"),         # bigram overlap only -> clean
    ])
    hits = {r["doc_id"]: r["n_hits"]
            for r in contamination(corpus, eval_ngrams(evals, 3), 3).collect()}
    assert hits == {1: 1, 2: 1}
    kept = {r["doc_id"]
            for r in decontaminate(corpus, evals, 3).collect()}
    assert kept == {3, 4}


def test_decontaminate_blocklist_is_broadcast(spark):
    evals = _docs(spark, [(100, "alpha beta gamma delta")])
    corpus = _docs(spark, [(1, "x alpha beta gamma y")])
    plan = contamination(
        corpus, eval_ngrams(evals, 3), 3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_deterministic_sample_full_fraction_and_bounds(spark):
    """fraction >= 1.0 keeps everything (the naive 2-hex-char compare
    would silently keep ~1/16); non-positive fractions raise."""
    import pytest

    from document_ai_spark.operators.curation import deterministic_sample

    docs = _docs(spark, [(i, f"doc {i}") for i in range(64)])
    assert deterministic_sample(docs, fraction=1.0).count() == 64
    assert deterministic_sample(docs, fraction=1.5).count() == 64
    with pytest.raises(ValueError):
        deterministic_sample(docs, fraction=0.0)
    # Sub-1.0 fractions stay a strict, deterministic subset.
    half = deterministic_sample(docs, fraction=0.5)
    n = half.count()
    assert 0 < n < 64
    assert half.exceptAll(docs).count() == 0
