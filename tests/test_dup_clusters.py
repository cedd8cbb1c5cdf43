"""Transitive duplicate clustering (connected components over pairs)."""
from __future__ import annotations

from document_ai_spark.operators.dedup import (
    banded_near_dup_pairs,
    duplicate_clusters,
)


def test_transitive_closure_chain(spark):
    # a-b, b-c, plus an isolated pair (x, y): two components.
    pairs = spark.createDataFrame(
        [(2, 5), (5, 9), (20, 30)], schema="doc_a long, doc_b long")
    got = {r["doc_id"]: r["cluster"]
           for r in duplicate_clusters(pairs).collect()}
    assert got == {2: 2, 5: 2, 9: 2, 20: 20, 30: 20}


def test_longer_chain_within_iterations(spark):
    # Path 1-2-3-4-5 (diameter 4) must fully collapse.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], schema="doc_a long, doc_b long")
    got = {r["doc_id"]: r["cluster"]
           for r in duplicate_clusters(pairs).collect()}
    assert set(got.values()) == {1}


def test_deep_chain_converges(spark):
    # Diameter-9 path: the round-2 fixed-4-round version silently split
    # this into multiple clusters; the convergence-checked loop must
    # collapse it into one.
    n = 10
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], schema="doc_a long, doc_b long")
    got = {r["doc_id"]: r["cluster"]
           for r in duplicate_clusters(pairs).collect()}
    assert got == {i: 1 for i in range(1, n + 1)}


def test_nonconvergence_raises(spark):
    import pytest

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], schema="doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        duplicate_clusters(pairs, max_iter=2)


def test_clusters_from_real_pairs(spark):
    # Three mutated copies of one text -> one cluster of 4.
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(0, base),
         (1, base + " extra"),
         (2, "prefix " + base),
         (3, base.replace("eta", "XX")),
         (9, "totally different words entirely unrelated content here")],
        schema="doc_id long, text string")
    pairs = banded_near_dup_pairs(docs, jaccard_min=0.3)
    got = {r["doc_id"]: r["cluster"]
           for r in duplicate_clusters(pairs).collect()}
    assert 9 not in got
    assert len({got[i] for i in got}) == 1 and got.get(0) == 0
