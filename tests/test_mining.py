"""operators/mining.py: exact MG heavy n-grams + winnowed fingerprints."""
from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from document_ai_spark.operators import mining
from document_ai_spark.operators.curation import _span_windows
from document_ai_spark.operators.mining import (
    heavy_ngrams, winnow_fps, winnow_hot_spans)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])


def _corpus(spark, n=120):
    """Zipf-ish corpus: a planted boilerplate sentence on every 3rd doc,
    plus per-doc unique tails so the n-gram tail is long."""
    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    texts = []
    for i in range(n):
        body = " ".join(words[(i + j) % len(words)] + str(i * 41 + j)
                        for j in range(40))
        if i % 3 == 0:
            body = "accept all cookies to continue reading " + body
        if i % 5 == 0:
            body = body + " all rights reserved worldwide"
        texts.append(body)
    texts += ["", "   ", "one two"]          # edge docs
    return _docs(spark, texts)


def _naive(docs, n, min_count):
    from document_ai_spark.operators.dedup import _word_shingles
    return (docs.select(F.explode(_word_shingles(n)).alias("ngram"))
            .groupBy("ngram").agg(F.count(F.lit(1)).alias("n_count"))
            .where(F.col("n_count") >= min_count))


def test_heavy_ngrams_exact_vs_naive(spark):
    docs = _corpus(spark)
    got = {(r["ngram"], r["n_count"])
           for r in heavy_ngrams(docs, n=3, min_count=3).collect()}
    want = {(r["ngram"], r["n_count"])
            for r in _naive(docs, 3, 3).collect()}
    assert got == want and len(want) >= 6
    # the planted boilerplate 3-grams are among them at full multiplicity
    assert ("accept all cookies", 40) in got


def test_heavy_ngrams_exact_at_small_capacity(spark):
    """Capacity far below the distinct-n-gram count still yields the
    exact answer while the MG bound N < min_count*(capacity+1) holds."""
    docs = _corpus(spark)
    n_total = docs.select(
        F.explode(mining._word_shingles(2)).alias("g")).count()
    cap = n_total // 4 + 1                   # bound holds for min_count=5
    got = {(r["ngram"], r["n_count"])
           for r in heavy_ngrams(docs, n=2, min_count=5,
                                 capacity=cap).collect()}
    want = {(r["ngram"], r["n_count"])
            for r in _naive(docs, 2, 5).collect()}
    assert got == want


def test_heavy_ngrams_guard_raises(spark):
    """Capacity too small for the threshold -> loud failure, never a
    silently-incomplete result."""
    docs = _corpus(spark)
    with pytest.raises(Exception, match="heavy_ngrams"):
        heavy_ngrams(docs, n=3, min_count=2, capacity=8).collect()


def test_winnow_guarantee_shared_span(spark):
    """Any shared span of >= w + window - 1 tokens collides on >= 1
    SELECTED fingerprint (Schleimer et al. 2003, Theorem 1)."""
    w, window = 5, 4
    shared = " ".join(f"s{i}" for i in range(w + window - 1))
    a = "left unique preamble " + shared + " tail a1 a2 a3"
    b = "b0 b1 b2 other words here " + shared
    fps = winnow_fps(_docs(spark, [a, b]), w=w, window=window).collect()
    by_doc = {0: set(), 1: set()}
    for r in fps:
        by_doc[r["doc_id"]].add(r["fp"])
    assert by_doc[0] & by_doc[1]


def test_winnow_subset_and_density(spark):
    """Selected rows are a subset of the every-offset index (same fp at
    the same position) at reduced density."""
    w, window = 10, 8
    docs = _corpus(spark)
    sel = winnow_fps(docs, w=w, window=window)
    full = (_span_windows(docs, w).where(F.col("fp").isNotNull())
            .select("doc_id", "s", "fp"))
    n_sel, n_full = sel.count(), full.count()
    assert sel.join(full, ["doc_id", "s", "fp"], "left_anti").count() == 0
    # expected density 2/(window+1) ~ 0.22; tail clipping adds a little.
    assert 0 < n_sel < n_full * (3.5 / (window + 1))


def test_winnow_edge_docs(spark):
    """Empty / whitespace docs yield no rows; a doc shorter than w
    yields exactly its single whole-doc window."""
    out = winnow_fps(_docs(spark, ["", "   ", "one two"]),
                     w=10, window=4).collect()
    assert [(r["doc_id"], r["s"]) for r in out] == [(2, 1)]


def test_winnow_hot_spans_planted_pair(spark):
    w, window = 5, 4
    shared = " ".join(f"h{i}" for i in range(20))
    docs = _docs(spark, [f"x{i} " * 8 + (shared if i < 2 else "")
                         for i in range(6)])
    hot = winnow_hot_spans(docs, w=w, window=window, min_docs=2)
    assert hot.count() >= 1
