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


def test_containment_planted_container(spark):
    """A doc fully embedded in a larger doc scores containment ~1 even
    though its jaccard vs the container is far below any near-dup
    threshold — the case the op exists for."""
    from document_ai_spark.operators.mining import containment_pairs

    w, window = 5, 4
    inner = " ".join(f"w{i}" for i in range(40))          # 40 tokens
    chrome = " ".join(f"c{i}" for i in range(120))        # 3x the chrome
    docs = _docs(spark, [
        inner,                                  # 0: the contained doc
        chrome[: len(chrome) // 2] + " " + inner + " " + chrome,  # 1
        " ".join(f"u{i}" for i in range(60)),   # 2: unrelated
    ])
    out = {(r["doc_a"], r["doc_b"]): r
           for r in containment_pairs(docs, w=w, window=window,
                                      containment_min=0.5).collect()}
    assert (0, 1) in out
    assert out[(0, 1)]["containment"] >= 0.8
    assert not any(2 in k for k in out)
    # sanity: sketch jaccard of the pair is tiny (this is NOT a
    # near-dup-reachable pair), |A|/|B| ~ 40/220.
    assert 40 / 220 < 0.25


def test_containment_min_shared_floor(spark):
    """Two short docs sharing their single fallback fingerprint score
    1.0 on one fp of evidence; min_shared=2 suppresses them."""
    from document_ai_spark.operators.mining import containment_pairs

    w, window = 5, 4
    tiny = "t0 t1 t2 t3 t4 t5"                 # < w + window - 1 tokens
    docs = _docs(spark, [tiny, tiny + "", "other words entirely here"])
    loose = containment_pairs(docs, w=w, window=window).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in loose} == {(0, 1)}
    strict = containment_pairs(docs, w=w, window=window,
                               min_shared=2).collect()
    assert strict == []


def test_containment_direction_symmetric_score(spark):
    """containment = shared / min(|A|,|B|): the max directional
    containment, invariant to which side is bigger."""
    from document_ai_spark.operators.mining import containment_pairs

    w, window = 5, 4
    inner = " ".join(f"s{i}" for i in range(30))
    big = inner + " " + " ".join(f"p{i}" for i in range(90))
    a = containment_pairs(_docs(spark, [inner, big]),
                          w=w, window=window).collect()
    b = containment_pairs(_docs(spark, [big, inner]),
                          w=w, window=window).collect()
    assert len(a) == len(b) == 1
    assert a[0]["containment"] == b[0]["containment"]
    assert a[0]["shared_fps"] == b[0]["shared_fps"]


def test_heavy_ngrams_guard_raises_when_result_empty(spark):
    """Review regression (AQE empty-relation propagation): with every
    true heavy hitter evicted AND the exact side empty, the in-plan
    assert_true used to be elided by AQE and the op returned [] —
    silently wrong. The guard now evaluates eagerly at plan build and
    must raise even though the would-be result is empty."""
    docs = _docs(spark, [" ".join(f"u{i}x{j}" for j in range(30))
                         for i in range(40)])          # all-unique grams
    with pytest.raises(Exception, match="heavy_ngrams"):
        heavy_ngrams(docs, n=3, min_count=2, capacity=4)


def test_heavy_ngrams_empty_corpus(spark):
    """A legitimately empty corpus yields an empty result, not a
    spurious guard crash (sum over zero sentinel rows is NULL)."""
    empty = spark.createDataFrame([], "doc_id string, text string")
    assert heavy_ngrams(empty, n=3, min_count=2).collect() == []
